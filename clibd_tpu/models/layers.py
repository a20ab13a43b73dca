"""Core transformer layers: pure-functional pytree modules.

TPU-first design decisions:

- **Stacked layers + lax.scan.** All per-layer weights are stacked along a
  leading layer axis and the block body is scanned, so XLA compiles ONE block
  and pipelines it — faster compiles, identical math to a Python loop.
- **Fused QKV.** q/k/v projections are one [D, 3D] matmul (large MXU tile).
  The reference's separate HF q/k/v linears are fused at weight-conversion
  time; LoRA deltas (rank r on q and v only, reference image_encoder.py:40-46,
  dna_encoder.py:100-120) are added onto the q/v slices of the fused output.
- **Mixed precision.** Matmuls/attention run in `compute_dtype` (bf16 by
  default, matching the reference's autocast path, train_epoch.py:42-46);
  layernorms and softmax accumulate in fp32.

Parameter convention: weights are stored [in, out] for `x @ W` (transposed
from torch's [out, in] at conversion time).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# Attention implementation:
#   "auto"   (default) — flash Pallas kernel on a single-device TPU backend,
#            XLA einsum chain otherwise (CPU tests run the kernel only where
#            explicitly exercised; multi-device pjit global-math keeps XLA
#            since pallas_call does not auto-partition).
#   "pallas" — force the flash kernel (ops/pallas/attention.flash_attention_qkv).
#   "xla"    — force the einsum chain.
# Measured (v5e, 12-layer ViT-B stack, batch 256): flash 83 ms vs XLA 94 ms;
# the [B,H,N,N] score tensor never touches HBM (docs/PERF.md).
ATTENTION_IMPL = os.environ.get("CLIBD_ATTN_IMPL", "auto")

# Fold the attention out-projection into the flash kernel (the per-head
# context tensor then never exists in HBM — saves a [B,N,D] write + read per
# layer).  Measured on THIS chip (axon tunnel, Pallas DMA 170 GB/s): a wash —
# 1704 vs 1711 samples/s headline (block_b=2; 1696 at 4) — the saved HBM
# round-trip is cancelled by the out-proj running at Mosaic's lower GEMM
# rate.  Default OFF; re-measure on directly-attached v5e (819 GB/s DMA)
# where the DMA saving is projected to dominate.
ATTN_FUSE_OUTPROJ = os.environ.get("CLIBD_ATTN_FUSE_OUTPROJ", "0") == "1"
_ATTN_BLOCK_B = int(os.environ.get("CLIBD_ATTN_BLOCK_B", "2"))

# MLP implementation under the flash policy (same gating as attention):
#   "pallas" — fused fc1→GELU→fc2 kernel, the [rows, mlp_dim] intermediate
#              never touches HBM (ops/pallas/mlp.py).
#   "xla"    — two XLA GEMMs with the intermediate in HBM.
# Measured on this chip and REJECTED as default: 1559 (rows 128, weights
# VMEM-resident) / 1507 (rows 512, F-chunked weight streaming) vs 1710
# samples/s headline for XLA.  16 MB VMEM cannot hold the 9 MB weight pair
# AND MXU-efficient 512-row intermediates, and any streaming split pays
# more DMA than XLA's near-roofline intermediate streaming (docs/PERF.md).
MLP_IMPL = os.environ.get("CLIBD_MLP_IMPL", "xla")

# lax.scan unroll factor for the tower layer loop.  A round-4 train-step
# trace showed the scan-carried weight-grad accumulation (GEMM fused into a
# dynamic-update-slice onto the stacked [L, ...] grad arrays) ~10x off the
# MXU roofline (~165 ms of a 1007 ms batch-500 step); with unroll the layer
# indices become constants and XLA can lay out each layer's grad GEMM
# separately.  1 = plain scan (default); L or more = fully unrolled.
SCAN_UNROLL = int(os.environ.get("CLIBD_SCAN_UNROLL", "1"))

_FLASH_CTX = __import__("threading").local()


def flash_context(enabled: bool):
    """Trace-time override for the 'auto' policy: code that guarantees
    per-device local shapes (the shard_map extraction path) wraps its trace
    in `with flash_context(True):` so the kernel engages on multi-chip TPU
    meshes too (plain multi-device jit keeps XLA — pallas_call does not
    auto-partition)."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        prev = getattr(_FLASH_CTX, "on", None)
        _FLASH_CTX.on = enabled
        try:
            yield
        finally:
            _FLASH_CTX.on = prev

    return _ctx()


def _flash_enabled() -> bool:
    if ATTENTION_IMPL == "pallas":
        return True
    if ATTENTION_IMPL == "xla":
        return False
    ctx = getattr(_FLASH_CTX, "on", None)
    if ctx is not None:
        return ctx and jax.default_backend() == "tpu"
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _precision(compute_dtype):
    """fp32 compute requests HIGHEST precision (JAX's DEFAULT runs fp32
    matmuls as bf16 passes, which would break fp32 parity tests); bf16
    compute uses the fast default MXU path."""
    return jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None


def linear(params: dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    w = params["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=compute_dtype,
                precision=_precision(compute_dtype))
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(compute_dtype)
    return y


def layernorm(params: dict, x: jnp.ndarray, eps: float = 1e-12, fast: bool = False) -> jnp.ndarray:
    """LayerNorm. Default: full fp32 compute (stability + fp32 parity).

    fast=True (bf16 inputs only): mean/var still accumulate in fp32, but the
    normalize/scale arithmetic stays in bf16 — one fewer fp32 materialization
    of the [B, N, D] tensor per LN.  Additional error is below bf16 rounding
    noise; measured −7 ms on the 12-layer ViT-B stack (docs/PERF.md).
    """
    if fast and x.dtype != jnp.float32:
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32).astype(x.dtype)
        xc = x - mean
        var = jnp.mean(jax.lax.square(xc.astype(jnp.float32)), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
        return xc * inv * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


def gelu(x: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """GELU. Default: exact (erf) — torch nn.GELU default used by both timm
    ViT and HF BERT.  fast=True: tanh approximation — max abs deviation from
    erf-GELU ~3e-4, below bf16 quantization of unit-scale activations; the
    erf chain is the single largest VPU cost in the encoder (−25 ms on the
    12-layer ViT-B stack, docs/PERF.md)."""
    return jax.nn.gelu(x, approximate=fast)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP's QuickGELU: x·sigmoid(1.702x)."""
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS = {"gelu": gelu, "quick_gelu": quick_gelu}


def fused_qkv_attention(
    x: jnp.ndarray,
    qkv_w: jnp.ndarray,
    qkv_b: jnp.ndarray,
    out_w: jnp.ndarray,
    out_b: jnp.ndarray,
    num_heads: int,
    mask_bias: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Multi-head self-attention with fused QKV and optional LoRA on q/v.

    x: [B, N, D]; qkv_w: [D, 3D]; mask_bias: [B, 1, 1, N] additive bias.
    lora: {a_q [D,r], b_q [r,D], a_v [D,r], b_v [r,D]} or None.
    """
    B, N, D = x.shape
    head_dim = D // num_heads
    xc = x.astype(compute_dtype)

    qkv = jnp.dot(xc, qkv_w.astype(compute_dtype), preferred_element_type=compute_dtype,
                  precision=_precision(compute_dtype))
    qkv = checkpoint_name(qkv + qkv_b.astype(compute_dtype), "qkv")

    # the flash kernel takes a per-KEY additive mask ([B,1,1,N] collapsed to
    # its key row); a query-dependent mask — e.g. the CLIP text tower's
    # [1,1,N,N] causal bias — cannot be collapsed, so those fall through to
    # the XLA path
    flash_mask_ok = mask_bias is None or (
        mask_bias.shape[0] == B and mask_bias.shape[1] == 1 and mask_bias.shape[2] == 1)

    # LoRA deltas (shared by both attention implementations).  Adapters run
    # in compute_dtype — under bf16 this matches the reference's autocast
    # semantics (the LoRA linears sit inside the autocast region,
    # train_epoch.py:42-46); fp32 runs keep HIGHEST for parity tests.
    dq = dv = dk = None
    if lora is not None:
        hp = _precision(compute_dtype)
        dq = jnp.dot(jnp.dot(xc, lora["a_q"].astype(compute_dtype), precision=hp),
                     lora["b_q"].astype(compute_dtype), precision=hp)
        dv = jnp.dot(jnp.dot(xc, lora["a_v"].astype(compute_dtype), precision=hp),
                     lora["b_v"].astype(compute_dtype), precision=hp)
        if "a_k" in lora:  # q/k/v variant (reference add_lora_layer_to_open_clip)
            dk = jnp.dot(jnp.dot(xc, lora["a_k"].astype(compute_dtype), precision=hp),
                         lora["b_k"].astype(compute_dtype), precision=hp)

    if _flash_enabled() and flash_mask_ok:
        from ..ops.pallas.attention import flash_attention_qkv

        if lora is not None:
            # fold the deltas into the fused tensor (XLA fuses the concat+add
            # into the qkv matmul epilogue — no extra HBM pass)
            qkv = qkv + jnp.concatenate(
                [dq, dk if dk is not None else jnp.zeros_like(dq), dv], axis=-1)
        mask_row = None if mask_bias is None else mask_bias[:, 0, 0, :]
        # block_b=2 measured best IN-MODEL at both ViT (N=197) and BarcodeBERT
        # (N=133) shapes; standalone per-layer sweeps preferred larger blocks
        # for short sequences but regressed the full encoder (less DMA/compute
        # overlap with neighboring XLA ops) — trust end-to-end numbers only.
        # vmem_safe_block_b clamps oversized CLIBD_ATTN_BLOCK_B values that
        # would OOM the 16 MB scoped-VMEM budget under remat training
        # (measured: 4+ OOMs at ViT shapes, 8+ at BarcodeBERT shapes).
        from ..ops.pallas.attention import vmem_safe_block_b

        block_b = vmem_safe_block_b(_ATTN_BLOCK_B, qkv.shape[1], qkv.shape[2] // 3)
        if ATTN_FUSE_OUTPROJ:
            from ..ops.pallas.attention import flash_attention_qkv_outproj

            return checkpoint_name(flash_attention_qkv_outproj(
                qkv, out_w.astype(compute_dtype), out_b.astype(compute_dtype),
                num_heads, mask_row=mask_row, block_b=block_b), "attn_ctx")
        ctx = checkpoint_name(
            flash_attention_qkv(qkv, num_heads, mask_row=mask_row, block_b=block_b),
            "attn_ctx")
        out = jnp.dot(ctx, out_w.astype(compute_dtype), preferred_element_type=compute_dtype,
                      precision=_precision(compute_dtype))
        return out + out_b.astype(compute_dtype)

    q, k, v = jnp.split(qkv, 3, axis=-1)

    if lora is not None:
        q = q + dq
        v = v + dv
        if dk is not None:
            k = k + dk

    def split_heads(t):
        return t.reshape(B, N, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)

    prec = _precision(compute_dtype)
    scale = 1.0 / math.sqrt(head_dim)
    # scores materialize in compute_dtype (halves the [B,H,N,N] HBM traffic
    # in bf16 mode, +14% ViT throughput measured); softmax still accumulates
    # in fp32 for numerical parity.
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=compute_dtype,
                        precision=prec) * scale
    if mask_bias is not None:
        scores = scores + mask_bias.astype(compute_dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(compute_dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=compute_dtype,
                     precision=prec)
    ctx = checkpoint_name(ctx.transpose(0, 2, 1, 3).reshape(B, N, D), "attn_ctx")

    out = jnp.dot(ctx, out_w.astype(compute_dtype), preferred_element_type=compute_dtype,
                  precision=prec)
    return out + out_b.astype(compute_dtype)


# Checkpoint-name tags a remat policy can elect to save (tagged above):
#   attn → "attn_ctx" [B,N,D]   the attention context (flash kernel output) —
#          without it remat re-runs the flash forward in the backward ON TOP
#          of the kernel backward's own internal P recompute (attention would
#          be computed 3× per step; docs/PERF.md round-4 ledger)
#   qkv  → "qkv"      [B,N,3D]  the fused qkv projection output
#   mlp  → "mlp_mid"  [B,N,F]   the post-GELU MLP intermediate
_REMAT_TAGS = {"attn": "attn_ctx", "qkv": "qkv", "mlp": "mlp_mid"}


def remat_policy(spec):
    """Map a remat spec to a jax.checkpoint policy.

    spec: True → None (blanket remat: save nothing, recompute everything);
    "attn" / "qkv" / "mlp" or "+"-joined combinations ("attn+mlp") → save
    only those tagged intermediates; "dots" → XLA's
    dots_with_no_batch_dims_saveable (save every matmul output).
    """
    if spec is True:
        return None
    if spec == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    try:
        names = tuple(_REMAT_TAGS[p] for p in str(spec).split("+"))
    except KeyError:
        raise ValueError(
            f"unknown remat policy {spec!r}: expected True, 'dots', or a "
            f"'+'-joined subset of {sorted(_REMAT_TAGS)}") from None
    return jax.checkpoint_policies.save_only_these_names(*names)


def transformer_stack(
    stacked: dict,
    x: jnp.ndarray,
    num_heads: int,
    pre_ln: bool,
    ln_eps: float,
    mask_bias: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
    remat=False,
    activation: str = "gelu",
    fast_math: bool = True,
) -> jnp.ndarray:
    """Scan a transformer block over stacked per-layer params.

    stacked: dict of arrays with leading layer axis L:
      qkv_w [L,D,3D], qkv_b [L,3D], out_w [L,D,D], out_b [L,D],
      fc1_w [L,D,F], fc1_b [L,F], fc2_w [L,F,D], fc2_b [L,D],
      ln1_scale/ln1_bias [L,D], ln2_scale/ln2_bias [L,D]
    pre_ln: True = ViT/timm ordering; False = BERT post-LN ordering.
    lora: dict of stacked arrays a_q [L,D,r], b_q [L,r,D], a_v, b_v (or None).
    fast_math: tanh GELU + bf16 LN arithmetic; only takes effect under bf16
    compute (fp32 runs stay exact-erf/fp32-LN for checkpoint-parity tests).
    remat: False = no rematerialization; True = blanket jax.checkpoint of the
    block (recompute everything in the backward); a policy string (see
    `remat_policy`) saves the named intermediates so the backward skips their
    recompute — in particular "attn" keeps the flash kernel from being run a
    third time per step (remat recompute + the kernel backward's own internal
    P recompute).  Policies never change the math, only what is stored.
    """
    fast = fast_math and compute_dtype != jnp.float32

    def block(h, layer):
        p, lo = layer

        def attn(inp):
            return fused_qkv_attention(
                inp, p["qkv_w"], p["qkv_b"], p["out_w"], p["out_b"],
                num_heads=num_heads, mask_bias=mask_bias, lora=lo,
                compute_dtype=compute_dtype,
            )

        if activation == "gelu":
            act = functools.partial(gelu, fast=fast)
        else:
            act = _ACTIVATIONS[activation]

        def mlp(inp):
            if MLP_IMPL == "pallas" and _flash_enabled():
                from ..ops.pallas.mlp import fused_mlp

                kernel_act = ("gelu_tanh" if fast else "gelu") if activation == "gelu" \
                    else activation
                # The fused kernel never materializes the [B,N,F] post-GELU
                # intermediate in HBM, so the "mlp_mid" tag lands on the
                # kernel's [B,N,D] OUTPUT instead: an "mlp" remat policy then
                # saves the output (the backward skips re-running the fused
                # forward; its custom VJP recomputes the mid internally
                # regardless).  Without this tag the policy silently saved
                # nothing on this branch (round-4 ADVICE).
                return checkpoint_name(fused_mlp(
                    inp.astype(compute_dtype),
                    p["fc1_w"].astype(compute_dtype), p["fc1_b"].astype(compute_dtype),
                    p["fc2_w"].astype(compute_dtype), p["fc2_b"].astype(compute_dtype),
                    activation=kernel_act), "mlp_mid")
            hmid = checkpoint_name(
                act(linear({"w": p["fc1_w"], "b": p["fc1_b"]}, inp, compute_dtype)),
                "mlp_mid")
            return linear({"w": p["fc2_w"], "b": p["fc2_b"]}, hmid, compute_dtype)

        ln1 = {"scale": p["ln1_scale"], "bias": p["ln1_bias"]}
        ln2 = {"scale": p["ln2_scale"], "bias": p["ln2_bias"]}
        if pre_ln:
            h = h + attn(layernorm(ln1, h, ln_eps, fast=fast))
            h = h + mlp(layernorm(ln2, h, ln_eps, fast=fast))
        else:
            h = layernorm(ln1, h + attn(h), ln_eps, fast=fast)
            h = layernorm(ln2, h + mlp(h), ln_eps, fast=fast)
        return h, None

    if remat:
        block = jax.checkpoint(block, policy=remat_policy(remat))

    num_layers = stacked["qkv_w"].shape[0]
    if lora is None:
        lora = {
            "a_q": jnp.zeros((num_layers, 0, 0)), "b_q": jnp.zeros((num_layers, 0, 0)),
            "a_v": jnp.zeros((num_layers, 0, 0)), "b_v": jnp.zeros((num_layers, 0, 0)),
        }
        use_lora = False
    else:
        use_lora = True

    def scan_body(h, layer_params):
        p, lo = layer_params
        return block(h, (p, lo if use_lora else None))

    x, _ = jax.lax.scan(scan_body, x, (stacked, lora),
                        unroll=min(SCAN_UNROLL, num_layers))
    return x


# ---------------------------------------------------------------------------
# Initializers (torch-equivalent defaults)
# ---------------------------------------------------------------------------


def torch_linear_init(rng, in_dim: int, out_dim: int, with_bias: bool = True) -> dict:
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) → U(±1/sqrt(in));
    bias U(±1/sqrt(in))."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if with_bias:
        p["b"] = jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound)
    return p


def trunc_normal_init(rng, shape, std: float = 0.02) -> jnp.ndarray:
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def ln_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_stacked_block_params(rng, num_layers: int, dim: int, mlp_dim: int) -> dict:
    """Random init of a stacked transformer block (trunc-normal 0.02, zero bias)."""
    keys = jax.random.split(rng, 4)
    return {
        "qkv_w": trunc_normal_init(keys[0], (num_layers, dim, 3 * dim)),
        "qkv_b": jnp.zeros((num_layers, 3 * dim), jnp.float32),
        "out_w": trunc_normal_init(keys[1], (num_layers, dim, dim)),
        "out_b": jnp.zeros((num_layers, dim), jnp.float32),
        "fc1_w": trunc_normal_init(keys[2], (num_layers, dim, mlp_dim)),
        "fc1_b": jnp.zeros((num_layers, mlp_dim), jnp.float32),
        "fc2_w": trunc_normal_init(keys[3], (num_layers, mlp_dim, dim)),
        "fc2_b": jnp.zeros((num_layers, dim), jnp.float32),
        "ln1_scale": jnp.ones((num_layers, dim), jnp.float32),
        "ln1_bias": jnp.zeros((num_layers, dim), jnp.float32),
        "ln2_scale": jnp.ones((num_layers, dim), jnp.float32),
        "ln2_bias": jnp.zeros((num_layers, dim), jnp.float32),
    }


def attention_mask_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """HF-style extended mask: [B, N] {0,1} → additive [B,1,1,N] bias."""
    neg = jnp.finfo(jnp.float32).min
    return ((1.0 - attention_mask.astype(jnp.float32)) * neg)[:, None, None, :].astype(dtype)
