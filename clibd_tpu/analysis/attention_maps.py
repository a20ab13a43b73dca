"""Attention-rollout representation visualization (reference
scripts/result/representation_visualization/{image,dna}_representation_
visualization.py, 590 LoC).

The reference hooks torch attention-dropout modules to capture per-layer
attention probabilities; here a dedicated probe forward re-runs the stacked
transformer under `lax.scan` with the attention probabilities as the scanned
ys — one jitted program, [L, B, H, N, N] out, no hooks.

Rollout (reference image_representation_visualization.py:22-63): per layer
fuse heads (max/mean/min), zero the lowest `discard_ratio` of entries
(never the CLS column), A ← (fused + I)/2 row-normalized, multiply across
layers, read the CLS row. Two reference quirks are deliberately fixed and
documented: (a) the discard step only zeroed batch row 0 (the reference
runs B=1) — vectorized per-batch here; (b) `a / a.sum(dim=-1)` without
keepdim column-normalizes under torch broadcasting at B=1 — row
normalization (the published rollout algorithm, Abnar & Zuidema 2020) is
used here.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Probability probes
# ---------------------------------------------------------------------------


def _stack_attention_probs(stacked: dict, x, num_heads: int, pre_ln: bool,
                           ln_eps: float, mask_bias=None, lora=None):
    """Run the stacked transformer (XLA math, fp32) collecting per-layer
    attention probabilities. → probs [L, B, H, N, N]."""
    import math

    from ..models.layers import gelu, layernorm, linear

    B, N, D = x.shape
    hd = D // num_heads

    use_lora = lora is not None
    if lora is None:
        L = stacked["qkv_w"].shape[0]
        lora = {"a_q": jnp.zeros((L, 0, 0)), "b_q": jnp.zeros((L, 0, 0)),
                "a_v": jnp.zeros((L, 0, 0)), "b_v": jnp.zeros((L, 0, 0))}

    def body(h, layer):
        p, lo = layer

        def attn(inp):
            qkv = jnp.dot(inp, p["qkv_w"]) + p["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if use_lora and lo["a_q"].size:
                q = q + jnp.dot(jnp.dot(inp, lo["a_q"]), lo["b_q"])
                v = v + jnp.dot(jnp.dot(inp, lo["a_v"]), lo["b_v"])

            def heads(t):
                return t.reshape(B, N, num_heads, hd).transpose(0, 2, 1, 3)

            scores = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / math.sqrt(hd)
            if mask_bias is not None:
                scores = scores + mask_bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
            return jnp.dot(ctx, p["out_w"]) + p["out_b"], probs

        def mlp(inp):
            mid = gelu(linear({"w": p["fc1_w"], "b": p["fc1_b"]}, inp, jnp.float32))
            return linear({"w": p["fc2_w"], "b": p["fc2_b"]}, mid, jnp.float32)

        ln1 = {"scale": p["ln1_scale"], "bias": p["ln1_bias"]}
        ln2 = {"scale": p["ln2_scale"], "bias": p["ln2_bias"]}
        if pre_ln:
            a_out, probs = attn(layernorm(ln1, h, ln_eps))
            h = h + a_out
            h = h + mlp(layernorm(ln2, h, ln_eps))
        else:
            a_out, probs = attn(h)
            h = layernorm(ln1, h + a_out, ln_eps)
            h = layernorm(ln2, h + mlp(h), ln_eps)
        return h, probs

    _, probs = jax.lax.scan(body, x.astype(jnp.float32), (stacked, lora))
    return probs


def _vit_probs(params, images, num_heads: int, patch_size: int, ln_eps: float):
    from ..models.vit import patchify
    from ..models.layers import linear

    B = images.shape[0]
    patches = patchify(images.astype(jnp.float32), patch_size)
    x = linear(params["patch_embed"], patches, jnp.float32)
    cls = jnp.broadcast_to(params["cls_token"].astype(jnp.float32),
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(jnp.float32)
    return _stack_attention_probs(params["blocks"], x, num_heads, pre_ln=True,
                                  ln_eps=ln_eps, lora=params.get("lora"))


_vit_probs_jit = jax.jit(_vit_probs,
                         static_argnames=("num_heads", "patch_size", "ln_eps"))


def vit_attention_probs(params, images, cfg) -> np.ndarray:
    """images [B, S, S, 3] normalized → probs [L, B, H, N, N] (N = 1+patches)."""
    return np.asarray(_vit_probs_jit(
        params, jnp.asarray(images), num_heads=cfg.num_heads,
        patch_size=cfg.patch_size, ln_eps=cfg.layernorm_eps))


def bert_attention_probs(params, input_ids, attention_mask, cfg) -> np.ndarray:
    """BarcodeBERT/BERT attention probs [L, B, H, N, N] (post-LN stack)."""
    from ..models.layers import attention_mask_bias, layernorm

    ids = jnp.asarray(input_ids)
    N = ids.shape[1]
    emb = params["embeddings"]
    x = jnp.asarray(emb["word"], jnp.float32)[ids]
    x = x + jnp.asarray(emb["position"], jnp.float32)[:N][None, :, :]
    x = x + jnp.asarray(emb["token_type"], jnp.float32)[0][None, None, :]
    x = layernorm(emb["ln"], x, cfg.layernorm_eps)
    bias = None
    if attention_mask is not None:
        bias = attention_mask_bias(jnp.asarray(attention_mask)).astype(jnp.float32)
    probs = _stack_attention_probs(
        params["blocks"], x, cfg.num_heads, pre_ln=False,
        ln_eps=cfg.layernorm_eps, mask_bias=bias, lora=params.get("lora"))
    return np.asarray(probs)


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------


def attention_rollout(
    probs: np.ndarray,
    discard_ratio: float = 0.9,
    head_fusion: str = "max",
    layer_idx: Optional[int] = None,
    layer_range: tuple = (1, -6),
) -> np.ndarray:
    """probs [L, B, H, N, N] → CLS-to-token rollout mask [B, N-1], each row
    normalized to max 1. Default layer window = the reference's
    `attentions[1:-6]`; layer_idx selects a single layer instead."""
    L = probs.shape[0]
    if layer_idx is not None:
        layers = probs[layer_idx:layer_idx + 1]
    else:
        lo, hi = layer_range
        layers = probs[lo:hi if hi != 0 else L]
        if layers.shape[0] == 0:  # shallow probe models
            layers = probs
    B, _h, N, _ = layers.shape[1:]
    result = np.broadcast_to(np.eye(N, dtype=np.float64), (B, N, N)).copy()
    for attention in layers:
        if head_fusion == "mean":
            fused = attention.mean(axis=1)
        elif head_fusion == "max":
            fused = attention.max(axis=1)
        elif head_fusion == "min":
            fused = attention.min(axis=1)
        else:
            raise ValueError(f"head_fusion {head_fusion!r} not supported")
        fused = fused.astype(np.float64)
        flat = fused.reshape(B, -1)
        k = int(flat.shape[-1] * discard_ratio)
        if k > 0:
            idx = np.argpartition(flat, k, axis=-1)[:, :k]
            keep_cls = idx % N != 0  # never drop attention INTO the CLS column
            for b in range(B):
                cols = idx[b][keep_cls[b]]
                flat[b, cols] = 0.0
        a = (flat.reshape(B, N, N) + np.eye(N)) / 2.0
        a = a / a.sum(axis=-1, keepdims=True)
        result = a @ result
    mask = result[:, 0, 1:]
    mx = mask.max(axis=-1, keepdims=True)
    return (mask / np.maximum(mx, 1e-12)).astype(np.float32)


def mask_to_grid(mask_row: np.ndarray) -> np.ndarray:
    """[N-1] patch mask → [w, w] (224/16 → 14×14)."""
    width = int(round(len(mask_row) ** 0.5))
    return mask_row[: width * width].reshape(width, width)


def overlay_mask(image: np.ndarray, mask_grid: np.ndarray) -> np.ndarray:
    """Heatmap overlay (reference show_mask_on_image, :128-136): jet-colored
    upsampled mask blended onto the [H, W, 3] float image."""
    from matplotlib import cm

    from ..data.transforms import resize_bilinear

    H, W = image.shape[:2]
    up = resize_bilinear(mask_grid[..., None].astype(np.float32), H, W)[..., 0]
    heat = cm.jet(np.clip(up, 0, 1))[..., :3]
    out = heat * 0.5 + np.clip(image, 0, 1) * 0.5
    return np.clip(out / max(out.max(), 1e-12), 0, 1)


# ---------------------------------------------------------------------------
# Figures
# ---------------------------------------------------------------------------


def save_image_attention_figure(
    out_path: str,
    images: np.ndarray,
    masks_by_row: Dict[str, np.ndarray],
) -> str:
    """Grid figure: row 0 = original images, then one row per labeled mask
    set (e.g. "before alignment", "after alignment") — reference
    plot_figure(:167-206)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    rows = 1 + len(masks_by_row)
    fig, axes = plt.subplots(rows, n, figsize=(2 * n, 2 * rows), squeeze=False)
    for j in range(n):
        axes[0][j].imshow(np.clip(images[j], 0, 1))
        axes[0][j].axis("off")
    axes[0][0].set_ylabel("original")
    for i, (label, masks) in enumerate(masks_by_row.items(), start=1):
        for j in range(n):
            axes[i][j].imshow(overlay_mask(images[j], mask_to_grid(masks[j])))
            axes[i][j].axis("off")
        axes[i][0].set_title(label, fontsize=8, loc="left")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def save_dna_attention_figure(
    out_path: str,
    masks_by_order: Dict[str, np.ndarray],
) -> str:
    """Per-order token-importance heatmaps ([n_samples, n_tokens] each) —
    the DNA variant's output (dna_representation_visualization.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(masks_by_order)
    fig, axes = plt.subplots(n, 1, figsize=(10, 1.6 * n), squeeze=False)
    for i, (order, masks) in enumerate(masks_by_order.items()):
        ax = axes[i][0]
        ax.imshow(np.asarray(masks), aspect="auto", cmap="viridis",
                  interpolation="nearest")
        ax.set_ylabel(order, fontsize=8, rotation=0, ha="right", va="center")
        ax.set_yticks([])
        if i < n - 1:
            ax.set_xticks([])
    axes[-1][0].set_xlabel("token position")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def top_orders_barcodes(hdf5_path: str, split: str, n_orders: int = 5,
                        n_samples: int = 10):
    """→ {order: [barcode strings]} for the most frequent orders (reference
    get_top5_orders_dna_barcodes, dna_representation_visualization.py:124-153)."""
    from collections import Counter

    from ..data.hdf5 import BioscanSplit

    reader = BioscanSplit(hdf5_path, split)
    labels = reader.label_dicts()
    orders = [l["order"] for l in labels]
    top = [o for o, _c in Counter(orders).most_common(n_orders)]
    out: Dict[str, list] = {}
    for order in top:
        idx = np.asarray([i for i, o in enumerate(orders) if o == order][:n_samples])
        bs = reader.barcodes(idx)
        out[order] = [b.decode() if isinstance(b, bytes) else str(b) for b in bs]
    reader.close()
    return out
