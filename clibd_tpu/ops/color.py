"""Batched color augmentations on device (JAX): the SimCLR pipeline's
ColorJitter / RandomGrayscale / GaussianBlur (reference util/dataset.py:
305-326 get_simclr_pipeline_transform: ColorJitter(0.8s,0.8s,0.8s,0.2s)@p=0.8,
grayscale p=0.2, blur kernel ≈ size/10, sigma U(0.1,2)).

All ops take [B, H, W, 3] float [0,1] and a PRNG key; torchvision semantics:
brightness/contrast/saturation are blends toward 0 / mean-gray / grayscale,
hue shifts the HSV hue channel; results are clamped to [0,1].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy, NOT jnp: a module-level jnp.asarray initializes the JAX backend at
# import time, making EVERY CLI start (engine/__init__ imports simclr →
# here) pay device init — and hang outright during a tunnel outage.  jnp
# converts constants for free at trace time.
_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def _blend(a, b, factor):
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def adjust_brightness(images, factor):
    return _blend(images, jnp.zeros_like(images), factor[:, None, None, None])


def adjust_contrast(images, factor):
    gray_mean = (images * _GRAY_W).sum(-1, keepdims=True).mean(axis=(1, 2), keepdims=True)
    return _blend(images, gray_mean, factor[:, None, None, None])


def rgb_to_grayscale(images):
    g = (images * _GRAY_W).sum(-1, keepdims=True)
    return jnp.broadcast_to(g, images.shape)


def adjust_saturation(images, factor):
    return _blend(images, rgb_to_grayscale(images), factor[:, None, None, None])


def adjust_hue(images, delta):
    """delta in [-0.5, 0.5] turns of the hue wheel (torchvision convention)."""
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(v > 0, c / jnp.maximum(v, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(c > 0, h, 0.0)

    h = (h + delta[:, None, None]) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 1.0)


def random_color_jitter(
    key,
    images,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.8,
    hue: float = 0.2,
    p: float = 0.8,
):
    """torchvision ColorJitter applied with probability p per image (fixed
    canonical op order brightness→contrast→saturation→hue; torchvision
    shuffles the order per call — a stochastic detail without train-metric
    impact, documented here as an intentional simplification)."""
    B = images.shape[0]
    keys = jax.random.split(key, 5)
    apply = jax.random.uniform(keys[0], (B,)) < p
    fb = jax.random.uniform(keys[1], (B,), minval=max(0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(keys[2], (B,), minval=max(0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(keys[3], (B,), minval=max(0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(keys[4], (B,), minval=-hue, maxval=hue)
    out = adjust_brightness(images, fb)
    out = adjust_contrast(out, fc)
    out = adjust_saturation(out, fs)
    out = adjust_hue(out, fh)
    return jnp.where(apply[:, None, None, None], out, images)


def random_grayscale(key, images, p: float = 0.2):
    B = images.shape[0]
    apply = jax.random.uniform(key, (B,)) < p
    return jnp.where(apply[:, None, None, None], rgb_to_grayscale(images), images)


def gaussian_blur(key, images, kernel_size: int = 21, sigma_range: Tuple[float, float] = (0.1, 2.0)):
    """Separable Gaussian blur with per-image sigma ~ U(sigma_range)."""
    B, H, W, C = images.shape
    sigma = jax.random.uniform(key, (B,), minval=sigma_range[0], maxval=sigma_range[1])
    half = kernel_size // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(x[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    k = k / k.sum(axis=1, keepdims=True)  # [B, K]

    pad = [(0, 0), (half, half), (0, 0), (0, 0)]
    img_h = jnp.pad(images, pad, mode="edge")
    idx = jnp.arange(H)[:, None] + jnp.arange(kernel_size)[None, :]
    # [B, H, K, W, C] gather then weighted sum over K
    gathered = img_h[:, idx]  # [B, H, K, W, C]
    images = jnp.einsum("bhkwc,bk->bhwc", gathered, k)

    pad = [(0, 0), (0, 0), (half, half), (0, 0)]
    img_w = jnp.pad(images, pad, mode="edge")
    idxw = jnp.arange(W)[:, None] + jnp.arange(kernel_size)[None, :]
    gathered = img_w[:, :, idxw]  # [B, H, W, K, C]
    return jnp.einsum("bhwkc,bk->bhwc", gathered, k)


def simclr_augment(key, images, size: int = 224, jitter_strength: float = 1.0):
    """Device-side tail of the SimCLR view pipeline: the host supplies
    random-resized-crop'd [B, size, size, 3] images; this applies
    hflip → color jitter → grayscale → blur (reference order)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B = images.shape[0]
    do_h = jax.random.uniform(k1, (B, 1, 1, 1)) < 0.5
    images = jnp.where(do_h, images[:, :, ::-1, :], images)
    s = jitter_strength
    images = random_color_jitter(k2, images, 0.8 * s, 0.8 * s, 0.8 * s, 0.2 * s, p=0.8)
    images = random_grayscale(k3, images, p=0.2)
    ksize = int(0.1 * size)
    if ksize % 2 == 0:
        ksize -= 1
    images = gaussian_blur(k4, images, kernel_size=max(ksize, 3))
    return images
