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


def random_rotate(key, images: jnp.ndarray, max_degrees: float = 45.0) -> jnp.ndarray:
    """Per-image rotation by U(−max, max) degrees, nearest-neighbour sampling
    around the image center, zero fill (torchvision rotate tensor semantics:
    inverse affine map, align_corners=False grid)."""
    B, H, W, C = images.shape
    angles = jax.random.uniform(key, (B,), minval=-max_degrees, maxval=max_degrees)
    theta = jnp.deg2rad(angles)
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    # output pixel centers relative to image center
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

    # inverse rotation: source = R(-θ) · out
    src_x = cos[:, None, None] * xx[None] + sin[:, None, None] * yy[None]
    src_y = -sin[:, None, None] * xx[None] + cos[:, None, None] * yy[None]
    src_i = jnp.round(src_y + (H - 1) / 2.0).astype(jnp.int32)
    src_j = jnp.round(src_x + (W - 1) / 2.0).astype(jnp.int32)

    valid = (src_i >= 0) & (src_i < H) & (src_j >= 0) & (src_j < W)
    src_i = jnp.clip(src_i, 0, H - 1)
    src_j = jnp.clip(src_j, 0, W - 1)

    flat = images.reshape(B, H * W, C)
    gathered = jnp.take_along_axis(
        flat, (src_i * W + src_j).reshape(B, H * W, 1), axis=1
    ).reshape(B, H, W, C)
    return jnp.where(valid[..., None], gathered, 0.0)


def train_augment(key, images: jnp.ndarray, max_degrees: float = 45.0) -> jnp.ndarray:
    """Flips + rotation, matching the reference's post-crop augmentation order."""
    kf, kr = jax.random.split(key)
    images = random_flips(kf, images)
    return random_rotate(kr, images, max_degrees)
