"""Test-time corruption suite as pure, PRNG-keyed JAX functions.

Behavioral parity with /root/reference/diffusion/utils.py:272-413 (applied in
the fixed order noise -> lowres -> brightness -> contrast -> cover -> crop,
classification_train_separately.py:726-739). All functions take NHWC float
images in [0, 1] (channel-last is the TPU-friendly layout; the reference is
NCHW) and are jittable with static corruption parameters, so they run on
device inside the evaluation pipeline instead of on the host.

Randomized corruptions take an explicit PRNG key (the reference uses global
torch/python RNG state).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def add_noise(images: jnp.ndarray, noise_std: float, key: jax.Array) -> jnp.ndarray:
    """Additive Gaussian pixel noise (utils.py:272-279). No clipping — the
    reference doesn't clip either."""
    return images + jax.random.normal(key, images.shape, images.dtype) * noise_std


def bilinear_resize(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers and NO antialiasing — exactly
    torch ``F.interpolate(mode='bilinear', align_corners=False)`` semantics
    (jax.image.resize prefilters on downsample, which the reference doesn't).

    Separable: interpolate rows then columns via clamped-index gathers;
    weights are computed from the unclamped source coordinate, indices are
    clamped to the image (torch's edge behavior).
    """
    b, h, w, c = images.shape

    def axis_weights(out_size, in_size):
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        i0 = jnp.floor(src)
        frac = src - i0
        lo = jnp.clip(i0, 0, in_size - 1).astype(jnp.int32)
        hi = jnp.clip(i0 + 1, 0, in_size - 1).astype(jnp.int32)
        return lo, hi, frac.astype(images.dtype)

    y0, y1, wy = axis_weights(out_h, h)
    x0, x1, wx = axis_weights(out_w, w)
    rows = images[:, y0] * (1.0 - wy)[None, :, None, None] + images[:, y1] * wy[None, :, None, None]
    return rows[:, :, x0] * (1.0 - wx)[None, None, :, None] + rows[:, :, x1] * wx[None, None, :, None]


def down_up_sample(images: jnp.ndarray, k: int) -> jnp.ndarray:
    """Downsample by integer factor k (floor) then upsample back
    (utils.py:372-387), torch-interpolate bilinear semantics."""
    b, h, w, c = images.shape
    down = bilinear_resize(images, h // k, w // k)
    return bilinear_resize(down, h, w)


def adjust_brightness(images: jnp.ndarray, k: float) -> jnp.ndarray:
    """Add k to all pixels, clip to [0, 1] (utils.py:390-399)."""
    return jnp.clip(images + k, 0.0, 1.0)


def adjust_contrast(images: jnp.ndarray, k: float) -> jnp.ndarray:
    """Scale deviations from the per-image mean by k, clip to [0, 1]
    (utils.py:402-413)."""
    means = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(means + (images - means) * k, 0.0, 1.0)


def _square_mask(h: int, w: int, top: jnp.ndarray, left: jnp.ndarray, side: int) -> jnp.ndarray:
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    return (
        (rows >= top) & (rows < top + side) & (cols >= left) & (cols < left + side)
    )


def random_cover(
    images: jnp.ndarray, k: float, n: int, key: jax.Array, num_candidates: int = 32
) -> jnp.ndarray:
    """Black out n non-overlapping squares, each covering fraction k of the
    image area (utils.py:315-348, random_cover_new).

    The reference rejection-samples positions until non-overlapping; with
    static shapes we draw ``num_candidates`` candidate positions per region
    and take the first that doesn't overlap the accumulated mask (falling
    back to the first candidate if all overlap — for the reference's
    parameter ranges, n*k <= 0.3, collisions are rare)."""
    b, h, w, c = images.shape
    side = int((k * h * w) ** 0.5)
    if side == 0 or n == 0:
        return images
    top_range = h - side
    left_range = w - side

    def cover_one(img, key):
        def place(carry, key_j):
            mask = carry
            kt, kl = jax.random.split(key_j)
            tops = jax.random.randint(kt, (num_candidates,), 0, top_range + 1)
            lefts = jax.random.randint(kl, (num_candidates,), 0, left_range + 1)
            cand = jax.vmap(lambda t, l: _square_mask(h, w, t, l, side))(tops, lefts)
            overlaps = jnp.any(cand & mask[None], axis=(1, 2))
            idx = jnp.argmin(overlaps)  # first non-overlapping, else 0
            mask = mask | cand[idx]
            return mask, None

        keys = jax.random.split(key, n)
        mask, _ = jax.lax.scan(place, jnp.zeros((h, w), bool), keys)
        return img * (~mask[..., None]).astype(img.dtype)

    return jax.vmap(cover_one)(images, jax.random.split(key, b))


def random_crop_and_resize(images: jnp.ndarray, k: float, key: jax.Array) -> jnp.ndarray:
    """Per-image random square crop of side (1-k)*H, resized back to the
    original size bilinearly (utils.py:280-311)."""
    b, h, w, c = images.shape
    crop = int(w * (1.0 - k))

    def crop_one(img, key):
        kt, kl = jax.random.split(key)
        top = jax.random.randint(kt, (), 0, h - crop + 1)
        left = jax.random.randint(kl, (), 0, w - crop + 1)
        patch = jax.lax.dynamic_slice(img, (top, left, 0), (crop, crop, c))
        return bilinear_resize(patch[None], h, w)[0]

    return jax.vmap(crop_one)(images, jax.random.split(key, b))


def apply_corruptions(
    images: jnp.ndarray,
    key: jax.Array,
    noise_std: float = 0.0,
    low_resolution: int = 1,
    brightness: float = 0.0,
    contrast: float = 1.0,
    cover: Tuple[float, int] = (0.0, 0),
    crop: float = 0.0,
) -> jnp.ndarray:
    """Apply the reference's fixed corruption order
    (classification_train_separately.py:726-739) with the same
    enable-conditions (noise>0, lowres>1, brightness!=0, contrast!=1,
    cover_k>0, crop>0). Parameters are static — disabled stages compile
    away entirely."""
    k_noise, k_cover, k_crop = jax.random.split(key, 3)
    if noise_std > 0.0:
        images = add_noise(images, noise_std, k_noise)
    if low_resolution > 1:
        images = down_up_sample(images, low_resolution)
    if brightness != 0.0:
        images = adjust_brightness(images, brightness)
    if contrast != 1.0:
        images = adjust_contrast(images, contrast)
    if cover[0] > 0.0 and cover[1] > 0:
        images = random_cover(images, cover[0], cover[1], k_cover)
    if crop > 0.0:
        images = random_crop_and_resize(images, crop, k_crop)
    return images
