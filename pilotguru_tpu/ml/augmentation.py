"""Device-side batch augmentation for steering training.

Reference semantics (python/augmentation.py, python/image_helpers.py:161-224),
re-designed to run *inside the jitted train step* on the accelerator with
per-example PRNG instead of per-item Python callables in DataLoader workers:

  1. horizontal shifted-crop with linear label adjustment
     (augmentation.py:8-64): fraction ~ U(-1, 1), shift = round(fraction *
     max_shift), crop [margin + shift, margin + shift + target_width),
     label += fraction * shift_rate.
  2. PCA RGB shift (image_helpers.py:201-211): per-direction N(0,1)
     magnitudes, constant color offset over the image.
  3. Gaussian blur with probability (image_helpers.py:189-196): separable
     reflect-padded filter, radius round(4 * sigma) like scipy's default.
  4. Grayscale interpolation with probability (image_helpers.py:170-183):
     full grayscale via ITU-R 601 weights.

One ordering nuance vs the reference: pixel augmenters here run after the
crop (the reference blurs full-width images before the final center crop
when shift augmentation is off), which differs only in border-pixel blur
taps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RGB_TO_GRAY = (0.2989, 0.5870, 0.1140)


@dataclass(frozen=True)
class AugmentSettings:
    """Mirrors augmentation.AugmentSettings (augmentation.py:81-94)."""

    target_width: int = -1
    max_horizontal_shift_pixels: int = 0
    horizontal_label_shift_rate: Tuple[float, ...] = (0.0,)
    blur_sigma: float = 2.0
    blur_prob: float = 0.0
    grayscale_interpolate_prob: float = 0.0
    random_shift_directions: Optional[np.ndarray] = None  # [D, C]


def center_crop_width(images, target_width: int):
    """Centered width crop (io_helpers.py:128-133). images: [..., W, C]."""
    width = images.shape[-2]
    left = (width - target_width) // 2
    return jax.lax.slice_in_dim(images, left, left + target_width, axis=-2)


def random_shifted_crop(rng, images, labels, target_width, max_shift, shift_rate):
    """Per-example off-center crops with linear label adjustment.

    images: [B, H, W, C]; labels: [B, L]; shift_rate: [L].
    """
    b = images.shape[0]
    margin = (images.shape[2] - target_width) // 2
    fraction = jax.random.uniform(rng, (b,), minval=-1.0, maxval=1.0)
    shift = jnp.round(fraction * max_shift).astype(jnp.int32)
    left = margin + shift  # [B]

    def crop_one(img, l):
        return jax.lax.dynamic_slice_in_dim(img, l, target_width, axis=1)

    cropped = jax.vmap(crop_one)(images, left)
    new_labels = labels + fraction[:, None] * jnp.asarray(
        shift_rate, labels.dtype
    )[None, :]
    return cropped, new_labels


def pca_rgb_directions(images: np.ndarray) -> np.ndarray:
    """Variance-scaled PCA directions of pixel colors (image_helpers.py:161-168).

    images: [..., C] float array in [0, 1]. Returns [C, C] rows =
    explained_variance * component.
    """
    flat = np.reshape(images, (-1, images.shape[-1])).astype(np.float64)
    mean = flat.mean(axis=0)
    centered = flat - mean
    cov = centered.T @ centered / flat.shape[0]
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    return (eigvals[order][:, None] * eigvecs[:, order].T).astype(np.float32)


def random_pca_shift(rng, images, directions):
    """Constant per-example color offset along data PCA directions."""
    b = images.shape[0]
    d = directions.shape[0]
    mags = jax.random.normal(rng, (b, d), dtype=images.dtype)
    shift = mags @ jnp.asarray(directions, images.dtype)  # [B, C]
    return images + shift[:, None, None, :]


def _gaussian_kernel(sigma: float, dtype):
    radius = max(int(round(4.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return jnp.asarray(k / k.sum(), dtype), radius


def gaussian_blur(images, sigma: float):
    """Separable reflect-padded Gaussian blur, [B, H, W, C]."""
    kernel, radius = _gaussian_kernel(sigma, images.dtype)

    def blur_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        padded = jnp.pad(x, pad, mode="reflect")
        moved = jnp.moveaxis(padded, axis, -1)
        out = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(
            moved.reshape(-1, moved.shape[-1])
        ).reshape(moved.shape[:-1] + (moved.shape[-1] - 2 * radius,))
        return jnp.moveaxis(out, -1, axis)

    return blur_axis(blur_axis(images, 1), 2)


def grayscale(images):
    weights = jnp.asarray(RGB_TO_GRAY, images.dtype)
    gray = jnp.sum(images * weights[None, None, None, :], axis=-1, keepdims=True)
    return jnp.broadcast_to(gray, images.shape)


def _maybe_per_example(rng, prob, transformed, original):
    b = original.shape[0]
    apply = jax.random.uniform(rng, (b,)) < prob
    return jnp.where(apply[:, None, None, None], transformed, original)


def augment_batch(rng, images, labels, settings: AugmentSettings):
    """Apply the configured augmenter chain to one batch.

    images: [B, H, W, C] float in [0, 1]; labels: [B, L].
    Returns (images [B, H, target_width, C], labels).
    """
    k_shift, k_pca, k_blur, k_blur_p, k_gray = jax.random.split(rng, 5)

    if settings.max_horizontal_shift_pixels > 0:
        if settings.target_width <= 0:
            raise ValueError("target_width required with shift augmentation")
        images, labels = random_shifted_crop(
            k_shift,
            images,
            labels,
            settings.target_width,
            settings.max_horizontal_shift_pixels,
            jnp.asarray(settings.horizontal_label_shift_rate),
        )
    elif settings.target_width > 0:
        images = center_crop_width(images, settings.target_width)

    if settings.random_shift_directions is not None:
        images = random_pca_shift(k_pca, images, settings.random_shift_directions)

    if settings.blur_prob > 0:
        blurred = gaussian_blur(images, settings.blur_sigma)
        images = _maybe_per_example(k_blur_p, settings.blur_prob, blurred, images)

    if settings.grayscale_interpolate_prob > 0:
        images = _maybe_per_example(
            k_gray, settings.grayscale_interpolate_prob, grayscale(images), images
        )

    return images, labels
