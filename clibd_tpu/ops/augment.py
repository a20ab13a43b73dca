"""On-device batch augmentations (JAX, stateless PRNG, jit/vmap-friendly).

The tail of the reference's train transform (util/dataset.py:185-195) runs on
the TPU over the whole batch instead of per-image on CPU workers:
RandomHorizontalFlip(p=.5) → RandomVerticalFlip(p=.5) → RandomRotation(±45°,
nearest interpolation, zero fill — torchvision RandomRotation defaults).

All ops take [B, H, W, C] float arrays and a PRNG key; fixed shapes, no
data-dependent control flow (mask/select instead), so they fuse into the
surrounding jitted train step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def random_flips(key, images: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    """Horizontal then vertical random flips, independent per image."""
    kh, kv = jax.random.split(key)
    B = images.shape[0]
    do_h = jax.random.uniform(kh, (B, 1, 1, 1)) < p
    images = jnp.where(do_h, images[:, :, ::-1, :], images)
    do_v = jax.random.uniform(kv, (B, 1, 1, 1)) < p
    return jnp.where(do_v, images[:, ::-1, :, :], images)


def _select_roll_shift(x: jnp.ndarray, k: jnp.ndarray, pad: int, axis: int,
                       step: int = 1, circular: bool = False) -> jnp.ndarray:
    """Per-slice integer shift with zero fill via binary select-rolls:
    out[..., j, ...] = x[..., j + k, ...] along `axis`, where the signed
    shift k (|k| ≤ pad) varies per element of the OTHER axes (k must
    broadcast against x with `axis` dropped to size 1).  `step` scales
    shifts to element units (C for channel-folded pixel rows).

    Why this shape: a per-row dynamic shift is a gather, and both TPU
    gather forms lose badly at [500,224,224,3] — per-pixel take_along_axis
    377 ms, vmapped whole-row dynamic_slice 952 ms (unaligned ~2 KB slices
    serialize).  Decomposing the shift into bits turns it into
    ceil(log2(2·pad)) passes of STATIC jnp.roll + elementwise select —
    pure tiled data movement the TPU executes at HBM bandwidth (~20 ms
    total for the full 3-shear rotate; docs/PERF.md round-4 ledger).

    Zero fill, non-circular mode: the array is padded by pad·step on both
    ends of `axis`, all shifts become non-negative rolls-left of
    s = (k+pad)·step ≤ 2·pad·step, and wrap-around garbage only ever
    occupies the final 2·pad·step elements — beyond the window
    [0, L·step) that is sliced back out.

    Circular mode (`circular=True`, step must be 1): no padding — rolls
    compose mod L, and out-of-range reads are zeroed by the analytic mask
    0 ≤ j + k < L instead of by pad margins.  Used for the shear_y pass,
    where pad = ~H/2 would double the array every pass."""
    L = x.shape[axis]
    if circular:
        assert step == 1
        s = jnp.mod(k, L)  # non-negative roll-left amounts
        nbits = max(1, (L - 1).bit_length())
        for b in range(nbits):
            bit = ((s >> b) & 1).astype(bool)
            x = jnp.where(bit, jnp.roll(x, -(1 << b), axis=axis), x)
        j = jax.lax.broadcasted_iota(k.dtype, tuple(1 if d != axis else L
                                                    for d in range(x.ndim)), axis)
        src = j + k
        return jnp.where((src >= 0) & (src < L), x, 0)
    nbits = max(1, (2 * pad).bit_length())
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad * step, pad * step)
    xp = jnp.pad(x, widths)
    s = k + pad  # non-negative roll-left amounts in pixel units, broadcast vs x
    for b in range(nbits):
        bit = ((s >> b) & 1).astype(bool)
        xp = jnp.where(bit, jnp.roll(xp, -(1 << b) * step, axis=axis), xp)
    return jax.lax.slice_in_dim(xp, 0, L, axis=axis)


def random_rotate(key, images: jnp.ndarray, max_degrees: float = 45.0,
                  angles: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-image rotation by U(−max, max) degrees, nearest-neighbour sampling
    around the image center, zero fill (torchvision rotate tensor semantics:
    inverse affine map, align_corners=False grid; reference transform tail at
    util/dataset.py:185-195).

    TPU-first implementation: the Paeth three-shear decomposition
    R(θ) = shear_x(−tan θ/2) · shear_y(sin θ) · shear_x(−tan θ/2), each shear
    a per-row (or per-column) integer shift executed as binary select-rolls
    (`_select_roll_shift` — static data movement only; see there for why
    gathers lose on TPU).  The work canvas is widened by the maximum
    transient x-overflow so no pixel a direct rotation would keep is
    clipped mid-chain.  Nearest rounding happens per shear, so a given
    output pixel may read a source ≤1 px away from the one a single direct
    nearest map would pick (same fill, same value set, same geometry —
    distributionally equivalent augmentation).  Value-moving only (selects
    of unmodified inputs + zero fill), so it commutes bit-exactly with any
    dtype cast: augmenting in bf16 equals casting the fp32 augment result.
    """
    B, H, W, C = images.shape
    if angles is None:
        angles = jax.random.uniform(key, (B,), minval=-max_degrees, maxval=max_degrees)
    theta = jnp.deg2rad(angles)
    alpha = -jnp.tan(theta / 2.0)  # shear_x factor (passes 1 and 3)
    beta = jnp.sin(theta)          # shear_y factor (pass 2)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    # static shift bounds from max_degrees
    tmax = math.tan(math.radians(max_degrees) / 2.0)
    smax = math.sin(math.radians(max_degrees))
    px = int(math.ceil(tmax * (H / 2.0))) + 1   # max |x| shift per shear_x
    # transient x-overflow bound: keep W + 2*px columns through the chain,
    # crop the center W at the end
    Wk = W + 2 * px
    py = int(math.ceil(smax * (Wk / 2.0))) + 1  # max |y| shift in shear_y

    iy = jnp.arange(H, dtype=jnp.float32) - cy           # row offsets
    xk = jnp.arange(Wk, dtype=jnp.float32) - px - cx     # work-canvas x coords

    # inverse sampling: shear_x(α) forward is x' = x + α·y, so the image op
    # reads out[i, u] = in[i, u − round(α·iy)] → shift k1 = −round(α·iy)
    k1 = jnp.round(-alpha[:, None] * iy[None]).astype(jnp.int32)    # [B, H]
    # shear_y(β) forward is y' = y + β·x → k2 = −round(β·x_u)
    k2 = jnp.round(-beta[:, None] * xk[None]).astype(jnp.int32)     # [B, Wk]

    # single resident layout [B, H, Wk·C]: channels folded into the minor
    # axis (a trailing dim of 3 would be lane-padded ×42 by the (8,128)
    # tiling); shear_x rolls the minor axis in C-element steps, shear_y
    # rolls the H axis directly — no transposes anywhere
    x = jnp.pad(images, ((0, 0), (0, 0), (px, px), (0, 0)))  # [B,H,Wk,C]
    x = x.reshape(B, H, Wk * C)
    x = _select_roll_shift(x, k1[:, :, None], px, axis=2, step=C)
    k2e = jnp.repeat(k2, C, axis=1)[:, None, :]              # [B,1,Wk·C]
    x = _select_roll_shift(x, k2e, py, axis=1, circular=True)
    x = _select_roll_shift(x, k1[:, :, None], px, axis=2, step=C)
    return x.reshape(B, H, Wk, C)[:, :, px:px + W, :]


def train_augment(key, images: jnp.ndarray, max_degrees: float = 45.0) -> jnp.ndarray:
    """Flips + rotation, matching the reference's post-crop augmentation order."""
    kf, kr = jax.random.split(key)
    images = random_flips(kf, images)
    return random_rotate(kr, images, max_degrees)
