"""Pallas fused attention: interpret-mode numerics on the CPU backend."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

def _reference(q, k, v):
    hd = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


# ---------------------------------------------------------------------------
# flash_attention_qkv (round-2 kernel: fused-qkv input, custom VJP)
# ---------------------------------------------------------------------------

from clibd_tpu.ops.pallas.attention import _xla_attention_from_qkv, flash_attention_qkv


def _reference_qkv(qkv, num_heads, mask_row=None):
    B, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    q, k, v = np.split(qkv, 3, -1)

    def heads(t):
        return t.reshape(B, N, num_heads, hd).transpose(0, 2, 1, 3)

    s = np.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / math.sqrt(hd)
    if mask_row is not None:
        s = s + mask_row[:, None, None, :]
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", p, heads(v))
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)


@pytest.mark.parametrize("shape", [(3, 37, 4, 16), (2, 133, 2, 32), (5, 20, 2, 8)])
def test_flash_attention_qkv_matches_reference(rng, shape):
    B, N, H, hd = shape
    qkv = rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32)
    out = np.asarray(flash_attention_qkv(jnp.asarray(qkv), H, interpret=True))
    np.testing.assert_allclose(out, _reference_qkv(qkv, H), atol=2e-2, rtol=2e-2)


def test_flash_attention_qkv_mask(rng):
    B, N, H, hd = 2, 21, 2, 16
    qkv = rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32)
    mask = np.zeros((B, N), np.float32)
    mask[:, 15:] = np.finfo(np.float32).min
    out = np.asarray(flash_attention_qkv(jnp.asarray(qkv), H, mask_row=jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(out, _reference_qkv(qkv, H, mask), atol=2e-2, rtol=2e-2)


def test_flash_attention_qkv_grads_match_xla_recompute(rng, monkeypatch):
    """custom_vjp backward (bwd_impl=xla) == grads of the XLA recompute
    reference, to tight fp32 tolerance.  The default pallas backward is
    covered at bf16 tolerance by test_flash_bwd_kernel_matches_xla_recompute."""
    from clibd_tpu.ops.pallas import attention as A

    monkeypatch.setattr(A, "ATTN_BWD_IMPL", "xla")
    A._make_flash.cache_clear()
    B, N, H, hd = 2, 19, 2, 8
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32))

    def loss_flash(t):
        return (flash_attention_qkv(t, H, interpret=True) ** 2).sum()

    def loss_xla(t):
        return (_xla_attention_from_qkv(
            jnp.pad(t, ((0, 0), (0, 13), (0, 0))), None, H, N)[:, :N] ** 2).sum()

    g1 = jax.grad(loss_flash)(qkv)
    g2 = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-3)


def test_fused_qkv_attention_flash_integration(rng, monkeypatch):
    """layers.fused_qkv_attention with CLIBD_ATTN_IMPL=pallas (interpret on CPU)
    matches the XLA path, including LoRA deltas and a mask."""
    from clibd_tpu.models import layers

    B, N, H, D, r = 2, 23, 2, 32, 4
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    qkv_w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.1)
    qkv_b = jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32) * 0.1)
    out_w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    out_b = jnp.zeros((D,), jnp.float32)
    lora = {
        "a_q": jnp.asarray(rng.standard_normal((D, r)).astype(np.float32) * 0.1),
        "b_q": jnp.asarray(rng.standard_normal((r, D)).astype(np.float32) * 0.1),
        "a_v": jnp.asarray(rng.standard_normal((D, r)).astype(np.float32) * 0.1),
        "b_v": jnp.asarray(rng.standard_normal((r, D)).astype(np.float32) * 0.1),
    }
    mask = jnp.asarray((rng.random((B, N)) > 0.2).astype(np.float32))
    bias = layers.attention_mask_bias(mask)

    kwargs = dict(num_heads=H, mask_bias=bias, lora=lora, compute_dtype=jnp.float32)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "xla")
    ref = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    out = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_bwd_kernel_matches_xla_recompute(rng):
    """The dedicated Pallas backward (_flash_bwd_kernel) == the XLA-recompute
    backward, with and without mask (bf16-probability noise tolerance)."""
    from clibd_tpu.ops.pallas import attention as A

    B, N, H, hd = 3, 21, 4, 16
    D = H * hd
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32) * 0.4)
    maskv = np.zeros((B, N), np.float32)
    maskv[:, 16:] = np.finfo(np.float32).min
    g_out = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    for mr in (None, jnp.asarray(maskv)):
        def loss(t, impl):
            old = A.ATTN_BWD_IMPL
            A.ATTN_BWD_IMPL = impl
            A._make_flash.cache_clear()
            try:
                return jnp.sum(A.flash_attention_qkv(t, H, mask_row=mr, interpret=True) * g_out)
            finally:
                A.ATTN_BWD_IMPL = old
        g_pl = jax.grad(lambda t: loss(t, "pallas"))(qkv)
        g_xla = jax.grad(lambda t: loss(t, "xla"))(qkv)
        np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla), atol=2e-2, rtol=2e-2)


def test_flash_bwd_group_phasing_bit_identical(rng, monkeypatch):
    """CLIBD_ATTN_BWD_GROUP only batches statements across heads (all S dots,
    then all softmaxes, ...) — per-head math is untouched, so grads must be
    BIT-identical to group=1 for any group size, including ones that don't
    divide num_heads and ones larger than num_heads."""
    from clibd_tpu.ops.pallas import attention as A

    B, N, H, hd = 3, 21, 4, 16
    D = H * hd
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32) * 0.4)
    maskv = np.zeros((B, N), np.float32)
    maskv[:, 16:] = np.finfo(np.float32).min
    g_out = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    def grad_with_group(group, mr):
        monkeypatch.setattr(A, "ATTN_BWD_GROUP", group)
        monkeypatch.setattr(A, "ATTN_BWD_IMPL", "pallas")
        A._make_flash.cache_clear()
        return jax.grad(lambda t: jnp.sum(
            A.flash_attention_qkv(t, H, mask_row=mr, interpret=True) * g_out))(qkv)

    for mr in (None, jnp.asarray(maskv)):
        ref = np.asarray(grad_with_group(1, mr))
        for group in (2, 3, 4, 99):
            got = np.asarray(grad_with_group(group, mr))
            np.testing.assert_array_equal(got, ref, err_msg=f"group={group}")
    A._make_flash.cache_clear()


def test_flash_fwd_group_phasing_bit_identical(rng, monkeypatch):
    """CLIBD_ATTN_FWD_GROUP only batches the phased forward's statements in
    head groups (a group's QK^T dots, then its softmaxes, then its PV dots)
    — per-head math is untouched, so the output must be BIT-identical to
    the default all-heads phasing (group=0) for any group size, including
    non-dividing ones and ones larger than num_heads."""
    from clibd_tpu.ops.pallas import attention as A

    B, N, H, hd = 3, 21, 4, 16
    D = H * hd
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32) * 0.4)
    maskv = np.zeros((B, N), np.float32)
    maskv[:, 16:] = np.finfo(np.float32).min

    def fwd_with_group(group, mr, bphase=False):
        monkeypatch.setattr(A, "ATTN_FWD_GROUP", group)
        monkeypatch.setattr(A, "ATTN_FWD_BPHASE", bphase)
        A._make_flash.cache_clear()
        return A.flash_attention_qkv(qkv, H, mask_row=mr, interpret=True)

    for mr in (None, jnp.asarray(maskv)):
        ref = np.asarray(fwd_with_group(0, mr))
        for group in (1, 2, 3, 4, 99):
            got = np.asarray(fwd_with_group(group, mr))
            np.testing.assert_array_equal(got, ref, err_msg=f"group={group}")
        got = np.asarray(fwd_with_group(0, mr, bphase=True))
        np.testing.assert_array_equal(got, ref, err_msg="bphase")
    A._make_flash.cache_clear()


def test_flash_attention_qkv_outproj_matches_unfused(rng):
    """flash_attention_qkv_outproj == flash_attention_qkv → @out_w + out_b,
    values and grads (incl. out_w/out_b grads), with and without mask."""
    from clibd_tpu.ops.pallas.attention import flash_attention_qkv_outproj

    B, N, H, hd = 3, 19, 4, 24
    D = H * hd
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32) * 0.3)
    ow = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    ob = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    maskv = np.zeros((B, N), np.float32)
    maskv[:, 14:] = np.finfo(np.float32).min
    for mrow in (None, jnp.asarray(maskv)):
        ref = jnp.dot(flash_attention_qkv(qkv, H, mask_row=mrow, interpret=True), ow) + ob
        got = flash_attention_qkv_outproj(qkv, ow, ob, H, mask_row=mrow, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def loss_fused(t, w, b):
        return (flash_attention_qkv_outproj(t, w, b, H, interpret=True) ** 2).sum()

    def loss_ref(t, w, b):
        return ((jnp.dot(flash_attention_qkv(t, H, interpret=True), w) + b) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, ow, ob)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, ow, ob)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


def test_fused_qkv_attention_outproj_integration(rng, monkeypatch):
    """layers.fused_qkv_attention with ATTN_FUSE_OUTPROJ matches the XLA path."""
    from clibd_tpu.models import layers

    B, N, H, D = 2, 23, 2, 32
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    qkv_w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.1)
    qkv_b = jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32) * 0.1)
    out_w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    out_b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, N)) > 0.2).astype(np.float32))
    bias = layers.attention_mask_bias(mask)

    kwargs = dict(num_heads=H, mask_bias=bias, compute_dtype=jnp.float32)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "xla")
    ref = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    monkeypatch.setattr(layers, "ATTN_FUSE_OUTPROJ", True)
    out = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("activation", ["gelu_tanh", "gelu", "quick_gelu"])
def test_fused_mlp_matches_xla(rng, activation):
    """ops/pallas/mlp.fused_mlp == the XLA two-GEMM chain (values + all five
    grads), including non-divisible row counts (pad/slice path)."""
    from clibd_tpu.ops.pallas.mlp import _xla_mlp, fused_mlp

    R, D, F = 37, 64, 96
    x = jnp.asarray(rng.standard_normal((2, R, D)).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.standard_normal((D, F)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((F, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)

    ref = _xla_mlp(x.reshape(-1, D), w1, b1, w2, b2, activation).reshape(x.shape)
    got = fused_mlp(x, w1, b1, w2, b2, activation=activation,
                    rows_block=16, f_block=48, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # f_block=40 does not divide F=96 → wrapper clamps to the largest divisor
    # (no unguarded tail block may reach the accumulation grid)
    got_nd = fused_mlp(x, w1, b1, w2, b2, activation=activation,
                       rows_block=16, f_block=40, interpret=True)
    np.testing.assert_allclose(np.asarray(got_nd), np.asarray(ref), atol=1e-5, rtol=1e-5)

    g1 = jax.grad(
        lambda *a: (fused_mlp(*a, activation=activation, rows_block=16,
                              f_block=48, interpret=True) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(
        lambda *a: (_xla_mlp(a[0].reshape(-1, D), *a[1:], activation) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b).reshape(a.shape),
                                   atol=1e-3, rtol=1e-3)


def test_transformer_stack_fused_mlp_integration(rng, monkeypatch):
    """transformer_stack with MLP_IMPL=pallas (interpret on CPU) matches the
    XLA MLP path."""
    from clibd_tpu.models import layers
    from clibd_tpu.models.layers import init_stacked_block_params, transformer_stack

    stacked = init_stacked_block_params(jax.random.PRNGKey(0), 2, 32, 64)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    kwargs = dict(num_heads=4, pre_ln=True, ln_eps=1e-6, compute_dtype=jnp.float32)

    # force the flash gate open for BOTH runs (ATTENTION_IMPL=pallas keeps
    # attention identical) so the only difference is the MLP implementation
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    monkeypatch.setattr(layers, "MLP_IMPL", "xla")
    ref = transformer_stack(stacked, x, **kwargs)
    monkeypatch.setattr(layers, "MLP_IMPL", "pallas")
    got = transformer_stack(stacked, x, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_flash_attention_all_masked_row_matches_xla(rng):
    """A fully-masked attention row (e.g. an empty barcode under the overlap
    tokenizer) must behave like the XLA path: uniform softmax over the REAL
    keys, never attention onto padded columns (code-review finding)."""
    from clibd_tpu.models import layers

    B, N, H, D = 2, 21, 2, 32
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    qkv_w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.1)
    qkv_b = jnp.zeros((3 * D,), jnp.float32)
    out_w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    out_b = jnp.zeros((D,), jnp.float32)
    mask = jnp.asarray(np.stack([np.zeros(N), np.ones(N)]).astype(np.float32))  # row 0 all-masked
    bias = layers.attention_mask_bias(mask)

    kwargs = dict(num_heads=H, mask_bias=bias, lora=None, compute_dtype=jnp.float32)
    ref = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    import unittest.mock as um

    with um.patch.object(layers, "ATTENTION_IMPL", "pallas"):
        out = layers.fused_qkv_attention(x, qkv_w, qkv_b, out_w, out_b, **kwargs)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_vmem_safe_block_b_clamps_to_measured_ceiling(monkeypatch):
    """CLIBD_ATTN_BLOCK_B values that would OOM the 16 MB scoped-VMEM budget
    under remat training must clamp (with a warning), not crash the compile.
    Two calibrations (ops/pallas/attention.vmem_safe_block_b): the PHASED
    forward (default; tools/exp_vmem.py 2026-08-20 — ViT block_b=3 and BERT
    block_b=5 OOM at batch 500 under remat, 2/4 compile → 18.5·N·D·2
    bytes/row) and the legacy interleaved kernel (2026-08-18 —
    12.7·Npad·D·2, caps 3 ViT / 5 BERT)."""
    import warnings

    from clibd_tpu.ops.pallas import attention as A

    A._BLOCK_B_WARNED.clear()
    # phased (default) calibration
    monkeypatch.setattr(A, "ATTN_FWD_PHASED", True)
    assert A.vmem_safe_block_b(2, 197, 768) == 2     # default untouched
    assert A.vmem_safe_block_b(4, 133, 768) == 4     # at the BERT cap
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert A.vmem_safe_block_b(3, 197, 768) == 2  # ViT: measured OOM at 3
        assert A.vmem_safe_block_b(8, 133, 768) == 4  # BERT: measured OOM at 5
        assert A.vmem_safe_block_b(3, 197, 768) == 2  # repeat: no second warning
    assert sum("scoped-VMEM" in str(x.message) for x in w) == 2
    # legacy interleaved calibration
    monkeypatch.setattr(A, "ATTN_FWD_PHASED", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert A.vmem_safe_block_b(8, 197, 768) == 3   # ViT: Npad=208 → 3
        assert A.vmem_safe_block_b(8, 133, 768) == 5   # BarcodeBERT: Npad=144 → 5
        assert A.vmem_safe_block_b(64, 133, 768) == 5
    assert sum("scoped-VMEM" in str(x.message) for x in w) == 3  # once per (req, shape)
    A._BLOCK_B_WARNED.clear()


@pytest.mark.parametrize("masked", [False, True])
def test_flash_attention_npad16_escape_hatch_matches_default(rng, masked, monkeypatch):
    """Round-4 removed the explicit HBM N->16-multiple pad/slice around the
    flash kernels (~13% of the extraction step in the device trace); the
    CLIBD_ATTN_NPAD16=1 escape hatch restores it for A/B and must stay
    numerically identical to the new unpadded default."""
    B, N, H, hd = 3, 197, 4, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32))
    mask = None
    if masked:
        m = np.zeros((B, N), np.float32)
        m[:, N - 7:] = np.finfo(np.float32).min
        mask = jnp.asarray(m)

    monkeypatch.delenv("CLIBD_ATTN_NPAD16", raising=False)
    out_default = np.asarray(flash_attention_qkv(qkv, H, mask_row=mask, interpret=True))
    monkeypatch.setenv("CLIBD_ATTN_NPAD16", "1")
    out_padded = np.asarray(flash_attention_qkv(qkv, H, mask_row=mask, interpret=True))
    # On the real chip the two paths are bit-identical (measured 2026-08-19;
    # Mosaic tiles both to the same lanes).  CPU interpret mode reduces over
    # 197- vs 208-wide rows with different fp32 summation trees, so a few
    # softmax probs flip one bf16 ulp -> ~1e-4-scale output noise.
    np.testing.assert_allclose(out_default, out_padded, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_attention_phased_matches_interleaved(rng, masked, monkeypatch):
    """Round-4 made the flash forward issue all heads' QK^T dots, then all
    softmaxes, then all PV dots ("phased" — measured +6.6% extraction
    headline same-session, bit-identical on the chip for both tower shapes;
    docs/PERF.md round-4 ledger).  Per-head math is untouched, so the
    CLIBD_ATTN_PHASED=0 interleaved escape hatch must produce exactly the
    same output."""
    from clibd_tpu.ops.pallas import attention as attn_mod

    B, N, H, hd = 3, 197, 4, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32))
    mask = None
    if masked:
        m = np.zeros((B, N), np.float32)
        m[:, N - 7:] = np.finfo(np.float32).min
        mask = jnp.asarray(m)

    monkeypatch.setattr(attn_mod, "ATTN_FWD_PHASED", True)
    out_phased = np.asarray(flash_attention_qkv(qkv, H, mask_row=mask, interpret=True))
    monkeypatch.setattr(attn_mod, "ATTN_FWD_PHASED", False)
    out_interleaved = np.asarray(flash_attention_qkv(qkv, H, mask_row=mask, interpret=True))
    np.testing.assert_array_equal(out_phased, out_interleaved)
