"""CLIBD tri-encoder model: the reference's `SimpleCLIP`
(bioscanclip/model/simple_clip.py:21-61) as a pure-functional JAX pytree.

Forward returns L2-normalized per-modality embeddings plus the learnable
`logit_scale` (init log(1/0.07)); the model factory assembles encoders from
an ExperimentConfig (reference `load_clip_model`, simple_clip.py:100-246):
ViT-B/16 or MLP for image, BarcodeBERT or MLP for DNA, BERT-small for text;
LoRA rank-4 q/v adapters unless `disable_lora`; per-modality `freeze` flags
become a trainability mask consumed by optax.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config.schema import ExperimentConfig
from .bert import bert_encode, init_bert_params, mlm_head_apply
from .layers import linear, torch_linear_init
from .mlp import init_mlp_encoder_params, mlp_encoder_apply
from .vit import init_vit_params, vit_apply


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def dequantize_image(x: jnp.ndarray) -> jnp.ndarray:
    """Undo BatchSpec.transport_uint8 on device: uint8 → float [0,1] (XLA
    fuses the divide into the consumer); float inputs pass through.  The ONE
    place the transport contract is decoded — keep all call sites on it."""
    if x is not None and x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _clip_configs(cfg: ExperimentConfig):
    from .clip import CLIPTextConfig, CLIPVisionConfig

    c = cfg.clip
    vcfg = CLIPVisionConfig(
        image_size=c.image_size, patch_size=c.patch_size, hidden_size=c.vision_hidden,
        num_layers=c.vision_layers, num_heads=c.vision_heads, mlp_dim=c.vision_mlp,
        embed_dim=c.embed_dim, activation=c.activation,
    )
    tcfg = CLIPTextConfig(
        vocab_size=c.vocab_size, context_length=c.context_length,
        hidden_size=c.text_hidden, num_layers=c.text_layers, num_heads=c.text_heads,
        mlp_dim=c.text_mlp, embed_dim=c.embed_dim, activation=c.activation,
    )
    return vcfg, tcfg


def init_clibd_params(rng, cfg: ExperimentConfig) -> dict:
    keys = jax.random.split(rng, 5)
    lora_rank = 0 if cfg.disable_lora else cfg.lora_rank
    params: Dict[str, Any] = {"logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32)}

    if cfg.backbone == "open_clip":
        from .clip import init_clip_text_params, init_clip_vision_params

        vcfg, tcfg = _clip_configs(cfg)
        if cfg.image.enable:
            params["clip_vision"] = init_clip_vision_params(keys[0], vcfg, lora_rank=lora_rank)
        if cfg.language.enable:
            params["clip_text"] = init_clip_text_params(keys[2], tcfg, lora_rank=lora_rank)
        if cfg.dna.enable:
            params["dna_encoder"] = init_bert_params(
                keys[1], cfg.dna.bert, lora_rank=lora_rank, head_dim=cfg.output_dim
            )
        return params

    if cfg.image.enable:
        if cfg.image.input_type == "image":
            params["image_encoder"] = init_vit_params(
                keys[0], cfg.image.vit, output_dim=cfg.output_dim, lora_rank=lora_rank
            )
            if cfg.image.simclr_ckpt_path:
                # SimCLR-pretrained backbone (reference simple_clip.py:157-166)
                params["image_encoder"] = load_simclr_vit_backbone(
                    cfg.image.simclr_ckpt_path, params["image_encoder"], cfg
                )
        else:
            params["image_encoder"] = init_mlp_encoder_params(
                keys[0], cfg.image.input_dim, cfg.image.hidden_dim, cfg.output_dim
            )

    if cfg.dna.enable:
        if cfg.dna.input_type == "sequence":
            params["dna_encoder"] = init_bert_params(
                keys[1], cfg.dna.bert, lora_rank=lora_rank, head_dim=cfg.output_dim
            )
        else:
            params["dna_encoder"] = init_mlp_encoder_params(
                keys[1], cfg.dna.input_dim, cfg.dna.hidden_dim, cfg.output_dim
            )

    if cfg.language.enable:
        params["language_encoder"] = init_bert_params(keys[2], cfg.language.bert, lora_rank=lora_rank)
        params["language_proj"] = torch_linear_init(
            keys[3], cfg.language.bert.hidden_size, cfg.output_dim
        )
    return params


def load_simclr_vit_backbone(path: str, init_params: dict, cfg: ExperimentConfig) -> dict:
    """Load SimCLR-pretrained ViT weights into the image encoder, keeping the
    freshly-initialized head/LoRA (reference: load timm state_dict with
    'module.' stripping, then reset_classifier — simple_clip.py:157-166)."""
    import os

    from .convert import load_params_npz, load_torch_state_dict, strip_module_prefix, vit_params_from_timm_state_dict

    if os.path.isdir(path):
        loaded = load_params_npz(os.path.join(path, "params.npz"))
    elif path.endswith(".npz"):
        loaded = load_params_npz(path)
    else:
        sd = load_torch_state_dict(path)
        sd.pop("__meta__", None)
        sd = strip_module_prefix(sd)
        loaded = vit_params_from_timm_state_dict(sd, cfg.image.vit, output_dim=cfg.output_dim)
    out = dict(init_params)
    for key in ("patch_embed", "cls_token", "pos_embed", "blocks", "norm"):
        if key in loaded:
            out[key] = loaded[key]
    return out


def encode_image(params: dict, cfg: ExperimentConfig, image_input, compute_dtype=jnp.bfloat16, remat=False):
    if cfg.image.input_type == "image":
        image_input = dequantize_image(image_input)
        return vit_apply(params["image_encoder"], image_input, cfg.image.vit,
                         compute_dtype=compute_dtype, remat=remat, fast_math=cfg.fast_math)
    return mlp_encoder_apply(params["image_encoder"], image_input, compute_dtype)


def encode_dna(params: dict, cfg: ExperimentConfig, dna_tokens, compute_dtype=jnp.bfloat16, remat=False):
    if cfg.dna.input_type != "sequence":
        return mlp_encoder_apply(params["dna_encoder"], dna_tokens, compute_dtype)
    # new-BarcodeBERT path (cfg.dna.tokenizer == "overlap"): the pipeline
    # yields {input_ids, attention_mask} like the reference's batch-time HF
    # tokenizer (epoch/train_epoch.py:33-40)
    attention_mask = None
    if isinstance(dna_tokens, dict):
        attention_mask = dna_tokens.get("attention_mask")
        dna_tokens = dna_tokens["input_ids"]
    hidden = bert_encode(params["dna_encoder"], dna_tokens, cfg.dna.bert,
                         attention_mask=attention_mask,
                         compute_dtype=compute_dtype, remat=remat, fast_math=cfg.fast_math)
    if cfg.dna.readout == "softmax_mean":
        # Checkpoint-parity quirk (reference dna_encoder.py:131-137):
        # softmax over the 768-dim decoder output, then mean over sequence.
        logits = mlm_head_apply(params["dna_encoder"], hidden, cfg.dna.bert, compute_dtype,
                                fast_math=cfg.fast_math)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs.mean(axis=1)
    # "hidden_mean": the clean readout the reference authors said they would
    # switch to (dna_encoder.py:132-134) — mean of final hidden states through
    # the decoder head for dimensional consistency.
    logits = mlm_head_apply(params["dna_encoder"], hidden, cfg.dna.bert, compute_dtype,
                            fast_math=cfg.fast_math)
    return logits.astype(jnp.float32).mean(axis=1)


def encode_language(params: dict, cfg: ExperimentConfig, language_input: dict,
                    compute_dtype=jnp.bfloat16, remat=False):
    hidden = bert_encode(
        params["language_encoder"],
        language_input["input_ids"],
        cfg.language.bert,
        token_type_ids=language_input.get("token_type_ids"),
        attention_mask=language_input.get("attention_mask"),
        compute_dtype=compute_dtype,
        remat=remat,
        fast_math=cfg.fast_math,
    )
    # mean over ALL positions incl. padding — parity with reference
    # language_encoder.py:87-89 (`last_hidden_state.mean(dim=1)`).
    pooled = hidden.astype(jnp.float32).mean(axis=1)
    return linear(params["language_proj"], pooled, compute_dtype).astype(jnp.float32)


def clibd_apply(
    params: dict,
    cfg: ExperimentConfig,
    image_input=None,
    dna_input=None,
    language_input: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> dict:
    """Forward pass → dict of L2-normalized embeddings + logit_scale.

    Mirrors SimpleCLIP.forward (simple_clip.py:38-61): every present modality
    is encoded and normalized; logit_scale is returned exp()'d.
    """
    out: Dict[str, Any] = {"image": None, "dna": None, "language": None}
    if image_input is not None and "clip_vision" in params:
        from .clip import clip_normalize, clip_vision_apply

        image_input = dequantize_image(image_input)
        vcfg, _ = _clip_configs(cfg)
        feats = clip_vision_apply(params["clip_vision"], clip_normalize(image_input), vcfg, compute_dtype)
        out["image"] = l2_normalize(feats)
    elif image_input is not None and "image_encoder" in params:
        out["image"] = l2_normalize(encode_image(params, cfg, image_input, compute_dtype, remat))
    if dna_input is not None and "dna_encoder" in params:
        out["dna"] = l2_normalize(encode_dna(params, cfg, dna_input, compute_dtype, remat))
    if language_input is not None and "clip_text" in params:
        from .clip import clip_text_apply

        _, tcfg = _clip_configs(cfg)
        ids = language_input["input_ids"] if isinstance(language_input, dict) else language_input
        out["language"] = l2_normalize(clip_text_apply(params["clip_text"], ids, tcfg, compute_dtype))
    elif language_input is not None and "language_encoder" in params:
        out["language"] = l2_normalize(encode_language(params, cfg, language_input, compute_dtype, remat))
    out["logit_scale"] = jnp.exp(params["logit_scale"])
    return out


# ---------------------------------------------------------------------------
# Trainability mask (replaces torch requires_grad plumbing)
# ---------------------------------------------------------------------------


def trainable_mask(params: dict, cfg: ExperimentConfig) -> dict:
    """Boolean pytree: which params receive gradients.

    Reference semantics (simple_clip.py:100-246): with LoRA, backbones are
    frozen and only LoRA A/B, the replaced heads (ViT head, DNA decoder,
    text proj) and logit_scale train; with `disable_lora`, everything trains.
    Per-modality `freeze` flags then freeze that whole encoder.
    """

    def mask_tree(tree, value: bool):
        return jax.tree.map(lambda _: value, tree)

    mask = mask_tree(params, cfg.disable_lora)
    mask["logit_scale"] = not cfg.loss.fix_temperature

    if not cfg.disable_lora:
        for enc_key in ("image_encoder", "dna_encoder", "language_encoder", "clip_vision", "clip_text"):
            if enc_key in params and "lora" in params[enc_key]:
                mask[enc_key]["lora"] = mask_tree(params[enc_key]["lora"], True)
        if "image_encoder" in params and "head" in params["image_encoder"]:
            mask["image_encoder"]["head"] = mask_tree(params["image_encoder"]["head"], True)
        if "dna_encoder" in params and "mlm_head" in params["dna_encoder"]:
            mask["dna_encoder"]["mlm_head"]["decoder"] = mask_tree(
                params["dna_encoder"]["mlm_head"]["decoder"], True
            )
        if "language_proj" in params:
            mask["language_proj"] = mask_tree(params["language_proj"], True)
        # MLP encoders (feature inputs) are always fully trainable
        for enc_key in ("image_encoder", "dna_encoder"):
            if enc_key in params and "fc1" in params[enc_key]:
                mask[enc_key] = mask_tree(params[enc_key], True)

    freeze_flags = {
        "image_encoder": cfg.image.freeze,
        "dna_encoder": cfg.dna.freeze,
        "language_encoder": cfg.language.freeze,
        "clip_vision": cfg.image.freeze,
        "clip_text": cfg.language.freeze,
    }
    for enc_key, frozen in freeze_flags.items():
        if frozen and enc_key in params:
            mask[enc_key] = mask_tree(params[enc_key], False)
            if enc_key == "language_encoder" and "language_proj" in params:
                mask["language_proj"] = mask_tree(params["language_proj"], False)
    return mask


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
