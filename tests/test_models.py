"""Numerical parity tests: JAX encoders vs torch/HF reference math (fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
from clibd_tpu.models import (
    bert_encode,
    bert_params_from_hf_state_dict,
    clibd_apply,
    init_bert_params,
    init_clibd_params,
    init_lora_params,
    l2_normalize,
    load_params_npz,
    merge_lora_into_qkv,
    mlm_head_apply,
    save_params_npz,
    trainable_mask,
    vit_apply,
    vit_params_from_timm_state_dict,
)

F32 = jnp.float32


def small_bert_cfg(with_mlm=False):
    return BertConfig(
        vocab_size=50, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40, with_mlm_head=with_mlm,
    )


def hf_config(cfg):
    from transformers import BertConfig as HFConfig

    return HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def test_bert_parity_no_mask():
    import torch
    from transformers import BertModel

    cfg = small_bert_cfg()
    torch.manual_seed(0)
    hf = BertModel(hf_config(cfg)).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = bert_params_from_hf_state_dict(sd, cfg)

    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (3, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(bert_encode(params, jnp.asarray(ids), cfg, compute_dtype=F32))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_bert_parity_with_mask_and_token_types():
    import torch
    from transformers import BertModel

    cfg = small_bert_cfg()
    torch.manual_seed(1)
    hf = BertModel(hf_config(cfg)).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = bert_params_from_hf_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 9))
    att = np.ones((2, 9), dtype=np.int64)
    att[0, 5:] = 0
    att[1, 7:] = 0
    tt = np.zeros((2, 9), dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(att),
                 token_type_ids=torch.tensor(tt)).last_hidden_state.numpy()
    ours = np.asarray(
        bert_encode(params, jnp.asarray(ids), cfg,
                    token_type_ids=jnp.asarray(tt), attention_mask=jnp.asarray(att),
                    compute_dtype=F32)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_mlm_head_parity_and_dna_readout():
    import torch
    from transformers import BertForMaskedLM

    cfg = small_bert_cfg(with_mlm=True)
    torch.manual_seed(2)
    hf = BertForMaskedLM(hf_config(cfg)).eval()
    # replace decoder with a small head, like the reference does with output_dim
    out_dim = 16
    hf.cls.predictions.decoder = torch.nn.Linear(cfg.hidden_size, out_dim)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = bert_params_from_hf_state_dict(
        sd, cfg, prefix="bert.", mlm_head_prefix="cls.predictions."
    )

    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 7))
    with torch.no_grad():
        ref_logits = hf(torch.tensor(ids)).logits
        ref = ref_logits.softmax(dim=-1).mean(dim=1).numpy()
    hidden = bert_encode(params, jnp.asarray(ids), cfg, compute_dtype=F32)
    logits = mlm_head_apply(params, hidden, cfg, compute_dtype=F32)
    ours = np.asarray(jax.nn.softmax(logits, axis=-1).mean(axis=1))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# ViT parity vs a torch replica of timm vit_base semantics (scaled down)
# ---------------------------------------------------------------------------


class TorchMiniViT:
    """timm-style ViT forward in torch (pre-LN, exact GELU, token pooling)."""

    def __init__(self, cfg: ViTConfig, out_dim: int, seed: int = 0):
        import torch

        torch.manual_seed(seed)
        D, L = cfg.hidden_size, cfg.num_layers
        self.cfg = cfg
        self.conv = torch.nn.Conv2d(3, D, cfg.patch_size, cfg.patch_size)
        self.cls = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos = torch.nn.Parameter(torch.randn(1, cfg.seq_len, D) * 0.02)
        self.blocks = []
        for _ in range(L):
            blk = dict(
                norm1=torch.nn.LayerNorm(D, eps=cfg.layernorm_eps),
                qkv=torch.nn.Linear(D, 3 * D),
                proj=torch.nn.Linear(D, D),
                norm2=torch.nn.LayerNorm(D, eps=cfg.layernorm_eps),
                fc1=torch.nn.Linear(D, cfg.mlp_dim),
                fc2=torch.nn.Linear(cfg.mlp_dim, D),
            )
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(D, eps=cfg.layernorm_eps)
        self.head = torch.nn.Linear(D, out_dim)

    def state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.conv.weight.detach().numpy(),
            "patch_embed.proj.bias": self.conv.bias.detach().numpy(),
            "cls_token": self.cls.detach().numpy(),
            "pos_embed": self.pos.detach().numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
            "head.weight": self.head.weight.detach().numpy(),
            "head.bias": self.head.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = blk["norm1"].weight.detach().numpy()
            sd[p + "norm1.bias"] = blk["norm1"].bias.detach().numpy()
            sd[p + "attn.qkv.weight"] = blk["qkv"].weight.detach().numpy()
            sd[p + "attn.qkv.bias"] = blk["qkv"].bias.detach().numpy()
            sd[p + "attn.proj.weight"] = blk["proj"].weight.detach().numpy()
            sd[p + "attn.proj.bias"] = blk["proj"].bias.detach().numpy()
            sd[p + "norm2.weight"] = blk["norm2"].weight.detach().numpy()
            sd[p + "norm2.bias"] = blk["norm2"].bias.detach().numpy()
            sd[p + "mlp.fc1.weight"] = blk["fc1"].weight.detach().numpy()
            sd[p + "mlp.fc1.bias"] = blk["fc1"].bias.detach().numpy()
            sd[p + "mlp.fc2.weight"] = blk["fc2"].weight.detach().numpy()
            sd[p + "mlp.fc2.bias"] = blk["fc2"].bias.detach().numpy()
        return sd

    def forward(self, x):
        """x: [B, 3, H, W] torch tensor."""
        import torch
        import torch.nn.functional as TF

        cfg = self.cfg
        B = x.shape[0]
        D = cfg.hidden_size
        H = cfg.num_heads
        hd = D // H
        t = self.conv(x).flatten(2).transpose(1, 2)  # [B, N, D]
        t = torch.cat([self.cls.expand(B, -1, -1), t], dim=1) + self.pos
        for blk in self.blocks:
            h = blk["norm1"](t)
            qkv = blk["qkv"](h).reshape(B, -1, 3, H, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            att = (q @ k.transpose(-2, -1)) * (hd**-0.5)
            att = att.softmax(dim=-1)
            h = (att @ v).transpose(1, 2).reshape(B, -1, D)
            t = t + blk["proj"](h)
            h = blk["norm2"](t)
            t = t + blk["fc2"](TF.gelu(blk["fc1"](h)))
        t = self.norm(t)
        return self.head(t[:, 0])


def test_vit_parity():
    import torch

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                    num_heads=3, mlp_dim=48)
    ref = TorchMiniViT(cfg, out_dim=10, seed=3)
    params = vit_params_from_timm_state_dict(ref.state_dict(), cfg, output_dim=10)

    rng = np.random.default_rng(4)
    imgs = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        expected = ref.forward(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_apply(params, jnp.asarray(imgs), cfg, compute_dtype=F32))
    np.testing.assert_allclose(ours, expected, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# LoRA semantics
# ---------------------------------------------------------------------------


def test_lora_zero_init_is_identity():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                    num_heads=3, mlp_dim=48)
    key = jax.random.PRNGKey(0)
    from clibd_tpu.models.vit import init_vit_params

    base = init_vit_params(key, cfg, output_dim=10, lora_rank=0)
    with_lora = dict(base)
    with_lora["lora"] = init_lora_params(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_size, 4)

    imgs = jnp.asarray(np.random.default_rng(5).standard_normal((2, 32, 32, 3), dtype=np.float32))
    out_base = vit_apply(base, imgs, cfg, compute_dtype=F32)
    out_lora = vit_apply(with_lora, imgs, cfg, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_lora), atol=1e-6)


def test_lora_merge_equivalence():
    """Nonzero LoRA applied on the fly == LoRA merged into qkv weights."""
    cfg = small_bert_cfg()
    key = jax.random.PRNGKey(2)
    params = init_bert_params(key, cfg, lora_rank=4)
    # make B nonzero
    k = jax.random.PRNGKey(3)
    params["lora"]["b_q"] = 0.1 * jax.random.normal(k, params["lora"]["b_q"].shape)
    params["lora"]["b_v"] = 0.1 * jax.random.normal(k, params["lora"]["b_v"].shape)

    ids = jnp.asarray(np.random.default_rng(6).integers(0, cfg.vocab_size, (2, 7)))
    out_dynamic = bert_encode(params, ids, cfg, compute_dtype=F32)

    merged = dict(params)
    merged["blocks"] = merge_lora_into_qkv(params["blocks"], params["lora"])
    merged = {k2: v for k2, v in merged.items() if k2 != "lora"}
    out_merged = bert_encode(merged, ids, cfg, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(out_dynamic), np.asarray(out_merged), atol=1e-4)


def test_lora_merge_includes_k_adapters():
    """q/k/v-variant adapters (the CLIP towers' layout) must fold the k delta
    too — regression: merge used to silently drop a_k/b_k."""
    from clibd_tpu.models.layers import fused_qkv_attention, init_stacked_block_params

    rng = np.random.default_rng(0)
    L, D, r, B, N, H = 1, 16, 2, 2, 5, 2
    stacked = init_stacked_block_params(jax.random.PRNGKey(0), L, D, 2 * D)
    lora = {}
    for nm in ("a_q", "a_k", "a_v"):
        lora[nm] = jnp.asarray(rng.standard_normal((L, D, r)).astype(np.float32) * 0.1)
    for nm in ("b_q", "b_k", "b_v"):
        lora[nm] = jnp.asarray(rng.standard_normal((L, r, D)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    p = {k: v[0] for k, v in stacked.items()}
    lo = {k: v[0] for k, v in lora.items()}
    dyn = fused_qkv_attention(x, p["qkv_w"], p["qkv_b"], p["out_w"], p["out_b"],
                              num_heads=H, lora=lo, compute_dtype=F32)
    merged = merge_lora_into_qkv(stacked, lora)
    pm = {k: v[0] for k, v in merged.items()}
    mer = fused_qkv_attention(x, pm["qkv_w"], pm["qkv_b"], pm["out_w"], pm["out_b"],
                              num_heads=H, lora=None, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(mer), atol=1e-5)


# ---------------------------------------------------------------------------
# Full model, masks, npz roundtrip
# ---------------------------------------------------------------------------


def tiny_experiment():
    cfg = ExperimentConfig()
    cfg.image.vit = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                              num_layers=2, num_heads=3, mlp_dim=48)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=24, num_layers=2,
                              num_heads=3, intermediate_size=48,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.bert = BertConfig(vocab_size=60, hidden_size=16, num_layers=2,
                                   num_heads=2, intermediate_size=32,
                                   max_position_embeddings=24)
    cfg.output_dim = 12
    return cfg


def test_clibd_apply_shapes_and_norm():
    cfg = tiny_experiment()
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    B = 3
    out = clibd_apply(
        params, cfg,
        image_input=jnp.asarray(rng.standard_normal((B, 32, 32, 3), dtype=np.float32)),
        dna_input=jnp.asarray(rng.integers(0, 1027, (B, 133))),
        language_input={
            "input_ids": jnp.asarray(rng.integers(0, 60, (B, 20))),
            "token_type_ids": jnp.zeros((B, 20), jnp.int32),
            "attention_mask": jnp.ones((B, 20), jnp.int32),
        },
        compute_dtype=F32,
    )
    for mod in ("image", "dna", "language"):
        assert out[mod].shape == (B, 12)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out[mod]), axis=-1), 1.0, atol=1e-5)
    assert abs(float(out["logit_scale"]) - 1 / 0.07) < 1e-3


def test_trainable_mask_lora_mode():
    cfg = tiny_experiment()
    cfg.disable_lora = False
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg)
    assert mask["logit_scale"] is True
    assert mask["image_encoder"]["lora"]["a_q"] is True
    assert mask["image_encoder"]["blocks"]["qkv_w"] is False
    assert mask["image_encoder"]["head"]["w"] is True
    assert mask["dna_encoder"]["mlm_head"]["decoder"]["w"] is True
    assert mask["dna_encoder"]["mlm_head"]["transform"]["w"] is False
    assert mask["language_proj"]["w"] is True
    # full fine-tune mode
    cfg.disable_lora = True
    params2 = init_clibd_params(jax.random.PRNGKey(0), cfg)
    mask2 = trainable_mask(params2, cfg)
    assert mask2["image_encoder"]["blocks"]["qkv_w"] is True
    # freeze flag wins
    cfg.dna.freeze = True
    mask3 = trainable_mask(params2, cfg)
    assert mask3["dna_encoder"]["blocks"]["qkv_w"] is False


def test_npz_roundtrip(tmp_path):
    cfg = tiny_experiment()
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    save_params_npz(jax.tree.map(np.asarray, params), path)
    loaded = load_params_npz(path)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    for kp, leaf in flat_a:
        node = loaded
        for part in kp:
            node = node[part.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)


def test_load_barcode_bert_raw_checkpoint(tmp_path):
    """Raw BarcodeBERT checkpoint ({'model': sd, 'bert_config': ...}) with
    module. prefixes (reference load_pre_trained_bioscan_bert)."""
    import torch
    from transformers import BertForMaskedLM

    from clibd_tpu.models.convert import load_barcode_bert_checkpoint

    cfg = small_bert_cfg(with_mlm=True)
    hfc = hf_config(cfg)
    torch.manual_seed(5)
    hf = BertForMaskedLM(hfc).eval()
    sd = {"module." + k: v for k, v in hf.state_dict().items()}
    ckpt = {
        "model": sd,
        "bert_config": {
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers, "num_attention_heads": cfg.num_heads,
            "intermediate_size": cfg.intermediate_size,
            "max_position_embeddings": cfg.max_position_embeddings,
        },
    }
    path = str(tmp_path / "barcode_bert.pth")
    torch.save(ckpt, path)

    params, loaded_cfg = load_barcode_bert_checkpoint(path)
    assert loaded_cfg.vocab_size == cfg.vocab_size
    assert loaded_cfg.num_layers == cfg.num_layers
    assert params["blocks"]["qkv_w"].shape == (cfg.num_layers, cfg.hidden_size, 3 * cfg.hidden_size)
    # forward parity through the converted params
    ids = np.random.default_rng(8).integers(0, cfg.vocab_size, (2, 9))
    with __import__("torch").no_grad():
        ref = hf.bert(__import__("torch").tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(bert_encode(params, jnp.asarray(ids), loaded_cfg, compute_dtype=F32))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_fast_math_embedding_parity():
    """fast_math (tanh GELU + bf16 LN) must add error of the same order as
    plain bf16 rounding: cosine(fp32, bf16_fast) within a hair of
    cosine(fp32, bf16_exact) on full-depth encoders."""
    from clibd_tpu.config.schema import ExperimentConfig
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import clibd_apply

    cfg = ExperimentConfig()
    cfg.image.vit.num_layers = 4
    cfg.dna.bert.num_layers = 4
    cfg.language.enable = False
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((4, 224, 224, 3), dtype=np.float32))
    dna = jnp.asarray(rng.integers(0, cfg.dna.bert.vocab_size, (4, 133)).astype(np.int32))

    ref = clibd_apply(params, cfg, img, dna, compute_dtype=F32)
    fast = clibd_apply(params, cfg, img, dna, compute_dtype=jnp.bfloat16)
    cfg.fast_math = False
    exact = clibd_apply(params, cfg, img, dna, compute_dtype=jnp.bfloat16)

    for mod in ("image", "dna"):
        r = np.asarray(ref[mod], np.float64)
        f = np.asarray(fast[mod], np.float64)
        e = np.asarray(exact[mod], np.float64)
        cos_fast = (r * f).sum(-1) / (np.linalg.norm(r, axis=-1) * np.linalg.norm(f, axis=-1))
        cos_exact = (r * e).sum(-1) / (np.linalg.norm(r, axis=-1) * np.linalg.norm(e, axis=-1))
        assert cos_fast.min() > 0.999, f"{mod}: fast-math cosine {cos_fast.min()}"
        # fast-math may not add more than ~the bf16 noise floor itself
        assert cos_fast.min() > cos_exact.min() - 2e-4, (
            f"{mod}: fast {cos_fast.min()} vs exact {cos_exact.min()}"
        )
