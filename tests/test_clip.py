"""CLIP towers: parity vs a torch replica (causal text transformer, fused
in_proj conversion), BPE tokenizer, zero-shot prompt ensembles."""

import gzip
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.models.clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_normalize,
    clip_params_from_state_dict,
    clip_text_apply,
    clip_vision_apply,
)

F32 = jnp.float32


def build_torch_clip(vcfg, tcfg, seed=0):
    """Random torch state_dict in open_clip naming + a reference forward."""
    import torch

    torch.manual_seed(seed)
    sd = {}
    D = vcfg.hidden_size

    def resblocks(prefix, L, D, F):
        for i in range(L):
            p = f"{prefix}.resblocks.{i}."
            sd[p + "attn.in_proj_weight"] = torch.randn(3 * D, D) * 0.02
            sd[p + "attn.in_proj_bias"] = torch.randn(3 * D) * 0.02
            sd[p + "attn.out_proj.weight"] = torch.randn(D, D) * 0.02
            sd[p + "attn.out_proj.bias"] = torch.randn(D) * 0.02
            sd[p + "mlp.c_fc.weight"] = torch.randn(F, D) * 0.02
            sd[p + "mlp.c_fc.bias"] = torch.randn(F) * 0.02
            sd[p + "mlp.c_proj.weight"] = torch.randn(D, F) * 0.02
            sd[p + "mlp.c_proj.bias"] = torch.randn(D) * 0.02
            sd[p + "ln_1.weight"] = torch.ones(D)
            sd[p + "ln_1.bias"] = torch.zeros(D)
            sd[p + "ln_2.weight"] = torch.ones(D)
            sd[p + "ln_2.bias"] = torch.zeros(D)

    sd["visual.conv1.weight"] = torch.randn(D, 3, vcfg.patch_size, vcfg.patch_size) * 0.02
    sd["visual.class_embedding"] = torch.randn(D) * 0.02
    sd["visual.positional_embedding"] = torch.randn(vcfg.seq_len, D) * 0.02
    sd["visual.ln_pre.weight"] = torch.ones(D)
    sd["visual.ln_pre.bias"] = torch.zeros(D)
    resblocks("visual.transformer", vcfg.num_layers, D, vcfg.mlp_dim)
    sd["visual.ln_post.weight"] = torch.ones(D)
    sd["visual.ln_post.bias"] = torch.zeros(D)
    sd["visual.proj"] = torch.randn(D, vcfg.embed_dim) * 0.02

    T = tcfg.hidden_size
    sd["token_embedding.weight"] = torch.randn(tcfg.vocab_size, T) * 0.02
    sd["positional_embedding"] = torch.randn(tcfg.context_length, T) * 0.02
    resblocks("transformer", tcfg.num_layers, T, tcfg.mlp_dim)
    sd["ln_final.weight"] = torch.ones(T)
    sd["ln_final.bias"] = torch.zeros(T)
    sd["text_projection"] = torch.randn(T, tcfg.embed_dim) * 0.02
    sd["logit_scale"] = torch.tensor(2.659)
    return sd


def torch_clip_text_forward(sd, tcfg, token_ids):
    import torch
    import torch.nn.functional as TF

    x = sd["token_embedding.weight"][torch.tensor(token_ids)]
    x = x + sd["positional_embedding"][: x.shape[1]]
    N = x.shape[1]
    mask = torch.triu(torch.full((N, N), float("-inf")), diagonal=1)
    D = tcfg.hidden_size
    H = tcfg.num_heads
    hd = D // H
    for i in range(tcfg.num_layers):
        p = f"transformer.resblocks.{i}."
        h = TF.layer_norm(x, (D,), sd[p + "ln_1.weight"], sd[p + "ln_1.bias"], eps=tcfg.layernorm_eps)
        qkv = h @ sd[p + "attn.in_proj_weight"].T + sd[p + "attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        B, N, _ = q.shape
        sh = lambda t: t.reshape(B, N, H, hd).transpose(1, 2)
        att = (sh(q) @ sh(k).transpose(-2, -1)) / math.sqrt(hd) + mask
        att = att.softmax(dim=-1)
        h = (att @ sh(v)).transpose(1, 2).reshape(B, N, D)
        h = h @ sd[p + "attn.out_proj.weight"].T + sd[p + "attn.out_proj.bias"]
        x = x + h
        h = TF.layer_norm(x, (D,), sd[p + "ln_2.weight"], sd[p + "ln_2.bias"], eps=tcfg.layernorm_eps)
        h = TF.gelu(h @ sd[p + "mlp.c_fc.weight"].T + sd[p + "mlp.c_fc.bias"])
        h = h @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
        x = x + h
    x = TF.layer_norm(x, (D,), sd["ln_final.weight"], sd["ln_final.bias"], eps=tcfg.layernorm_eps)
    eot = torch.tensor(token_ids).argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    return (pooled @ sd["text_projection"]).detach().numpy()


@pytest.fixture(scope="module")
def small_cfgs():
    vcfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                            num_heads=3, mlp_dim=48, embed_dim=16)
    tcfg = CLIPTextConfig(vocab_size=100, context_length=12, hidden_size=16,
                          num_layers=2, num_heads=2, mlp_dim=32, embed_dim=16)
    return vcfg, tcfg


def test_clip_text_parity(small_cfgs):
    vcfg, tcfg = small_cfgs
    sd_torch = build_torch_clip(vcfg, tcfg)
    sd = {k: v.numpy() for k, v in sd_torch.items()}
    vision, text, logit_scale = clip_params_from_state_dict(sd, vcfg, tcfg)
    assert abs(logit_scale - 2.659) < 1e-5

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, (3, 12))
    ids[:, -1] = 99  # EOT = max id
    ref = torch_clip_text_forward(sd_torch, tcfg, ids)
    ours = np.asarray(clip_text_apply(text, jnp.asarray(ids), tcfg, compute_dtype=F32))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_clip_text_causal_mask_survives_flash_mode(small_cfgs, monkeypatch):
    """With the flash attention gate forced open, the CLIP text tower's
    [1,1,N,N] causal mask cannot be collapsed to a key row — the layer must
    fall back to the XLA path and produce identical output (regression: the
    flash branch used to take mask_bias[:,0,0,:], which crashes for B>1 and
    silently masks everything but BOS for B=1)."""
    import jax as _jax

    from clibd_tpu.models import layers
    from clibd_tpu.models.clip import init_clip_text_params

    _, tcfg = small_cfgs
    params = init_clip_text_params(_jax.random.PRNGKey(0), tcfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, (3, 12))
    ids[:, -1] = 99
    ref = np.asarray(clip_text_apply(params, jnp.asarray(ids), tcfg, compute_dtype=F32))
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    out = np.asarray(clip_text_apply(params, jnp.asarray(ids), tcfg, compute_dtype=F32))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_clip_vision_shapes(small_cfgs):
    vcfg, tcfg = small_cfgs
    sd = {k: v.numpy() for k, v in build_torch_clip(vcfg, tcfg).items()}
    vision, _, _ = clip_params_from_state_dict(sd, vcfg, tcfg)
    rng = np.random.default_rng(1)
    imgs = clip_normalize(jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)))
    out = clip_vision_apply(vision, imgs, vcfg, compute_dtype=F32)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_tokenizer(tmp_path):
    from clibd_tpu.data.clip_tokenizer import CLIPTokenizer

    # tiny merges file in the standard format (version header + merges)
    merges = ["#version: 0.2", "h e", "he l", "hel l", "hell o</w>", "w o", "wo r", "wor l", "worl d</w>"]
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    tok = CLIPTokenizer(str(path), context_length=10)
    out = tok(["hello world", "hello"])
    assert out.shape == (2, 10)
    assert out[0, 0] == tok.sot
    # "hello" fully merges to one token; "world" to one token -> sot,hello,world,eot
    assert out[0, 3] == tok.eot
    assert out[1, 2] == tok.eot
    assert (out[1, 3:] == 0).all()
    # same word -> same id across calls
    assert out[0, 1] == tok(["hello"])[0, 1]


def test_zero_shot_prompt_ensemble(small_cfgs):
    from clibd_tpu.engine.zeroshot import (
        OPENAI_IMAGENET_TEMPLATES,
        build_class_prototypes,
        taxon_prompt,
        zero_shot_classify,
    )

    assert len(OPENAI_IMAGENET_TEMPLATES) == 80
    rng = np.random.default_rng(2)
    class_vecs = {"cat": rng.standard_normal(8), "dog": rng.standard_normal(8)}

    def encode_text(prompts):
        # deterministic fake encoder keyed on the class name in the prompt
        out = []
        for p in prompts:
            for name, vec in class_vecs.items():
                if name in p:
                    out.append(vec + 0.01 * rng.standard_normal(8))
                    break
            else:
                out.append(rng.standard_normal(8))
        return np.stack(out).astype(np.float32)

    protos = build_class_prototypes(["cat", "dog"], encode_text)
    assert protos.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(protos, axis=1), 1.0, atol=1e-5)

    queries = np.stack([class_vecs["dog"], class_vecs["cat"]]).astype(np.float32)
    names, scores = zero_shot_classify(queries, protos, ["cat", "dog"], max_k=2)
    assert names[0, 0] == "dog" and names[1, 0] == "cat"

    assert taxon_prompt({"order": "a", "family": "b", "genus": "c", "species": "d"}) == "a b c d"


def test_clibd_with_open_clip_backbone():
    from clibd_tpu.config.schema import BertConfig, ExperimentConfig
    from clibd_tpu.models import init_clibd_params, trainable_mask
    from clibd_tpu.models.clibd import clibd_apply

    cfg = ExperimentConfig()
    cfg.backbone = "open_clip"
    cfg.output_dim = 16
    c = cfg.clip
    c.image_size, c.patch_size = 32, 8
    c.vision_hidden, c.vision_layers, c.vision_heads, c.vision_mlp = 24, 2, 3, 48
    c.vocab_size, c.context_length = 100, 12
    c.text_hidden, c.text_layers, c.text_heads, c.text_mlp = 16, 2, 2, 32
    c.embed_dim = 16
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=24, num_layers=2,
                              num_heads=3, intermediate_size=48,
                              max_position_embeddings=140, with_mlm_head=True)

    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    assert "clip_vision" in params and "clip_text" in params and "dna_encoder" in params
    assert "lora" in params["clip_vision"] and "a_k" in params["clip_vision"]["lora"]

    rng = np.random.default_rng(3)
    ids = rng.integers(1, 99, (2, 12)); ids[:, -1] = 99
    out = clibd_apply(
        params, cfg,
        image_input=jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        dna_input=jnp.asarray(rng.integers(0, 1027, (2, 133))),
        language_input={"input_ids": jnp.asarray(ids)},
        compute_dtype=F32,
    )
    for m in ("image", "dna", "language"):
        assert out[m].shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out[m]), axis=1), 1.0, atol=1e-5)

    mask = trainable_mask(params, cfg)
    assert mask["clip_vision"]["lora"]["a_q"] is True
    assert mask["clip_vision"]["blocks"]["qkv_w"] is False


def test_clip_tokenizer_matches_hf_local(tmp_path):
    """Independent-implementation parity: our CLIP BPE vs HF CLIPTokenizer
    constructed from the same locally-generated vocab.json + merges.txt."""
    import json as _json

    import pytest

    try:
        from transformers import CLIPTokenizer as HFCLIPTokenizer
    except ImportError:
        pytest.skip("transformers unavailable")

    from clibd_tpu.data.clip_tokenizer import CLIPTokenizer

    merges = [
        "#version: 0.2",
        "h e", "he l", "hel l", "hell o</w>",
        "w o", "wo r", "wor l", "worl d</w>",
        "d i", "di p", "dip t", "dipt e", "dipte r", "dipter a</w>",
        "s p</w>", "1 2</w>",
    ]
    merges_path = tmp_path / "merges.txt"
    merges_path.write_text("\n".join(merges) + "\n")
    ours = CLIPTokenizer(str(merges_path), context_length=16)
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(_json.dumps(ours.encoder))
    hf = HFCLIPTokenizer(vocab_file=str(vocab_path), merges_file=str(merges_path))

    texts = ["hello world", "Diptera sp. 12", "hello", "unknown-token 7!"]
    for text in texts:
        ref = hf([text], padding="max_length", max_length=16, truncation=True)
        got = ours([text])
        # HF pads with eot-ish pad token? CLIPTokenizer pads with its pad token
        # (defaults to <|endoftext|>); openai/open_clip pad with 0 — compare
        # the non-pad prefix up to and including the first EOT.
        ref_ids = list(ref["input_ids"][0])
        got_ids = list(got[0])
        eot_pos = got_ids.index(ours.eot)
        assert got_ids[: eot_pos + 1] == ref_ids[: eot_pos + 1], text
