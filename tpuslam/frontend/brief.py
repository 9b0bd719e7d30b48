"""Gaussian blur, intensity-centroid orientation, and steered BRIEF.

Reference semantics (``src/frontend/feature_detector.cpp:205-364``):

  * 5×5 σ=1.0 Gaussian blur before description; interior convolved, border
    rows/cols copied from the original image (``:315-364``);
  * orientation = ``atan2(m01, m10)`` in **degrees** over the disc of radius
    ``PatchSize/2``; 0 if the patch is clipped by the image border
    (``:205-231``);
  * BRIEF pattern: Gaussian pairs scaled by patch/2, pairs with any
    coordinate ≥ scale rejected **without resampling**, so the pattern may
    hold fewer than ``NumBRIEFPairs`` entries (``:286-313``);
  * per keypoint: rotate each pair by the keypoint angle (float rotate, then
    C-style truncation to int), test ``I(p1) < I(p2)``, pack LSB-first into
    bytes; pairs falling outside the image are skipped *without advancing
    the bit index* (``:233-284``); keypoints within patch/2 of the border
    get an all-zero descriptor (``:242-245``).

TPU-native restructuring: blur is one ``lax.conv``; orientation gathers all
keypoint patches at once and reduces masked moments; the BRIEF "skip without
advancing" compaction becomes a cumulative-sum of the validity mask feeding a
one-hot scatter, so all 256 bits of all keypoints are produced by pure
fixed-shape tensor ops under ``vmap``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.frontend.fast import KeypointSet

BLUR_KERNEL_SIZE = 5  # reference feature_detector.hpp:17
BLUR_SIGMA = 1.0


def gaussian_kernel(kernel_size: int = BLUR_KERNEL_SIZE, sigma: float = BLUR_SIGMA) -> np.ndarray:
    """Normalised Gaussian kernel, float64 on host (reference ``:322-339``)."""
    if kernel_size % 2 == 0:
        raise ValueError("Kernel size must be odd")
    half = kernel_size // 2
    ii, jj = np.meshgrid(np.arange(-half, half + 1), np.arange(-half, half + 1), indexing="ij")
    k = np.exp(-(ii * ii + jj * jj) / (2.0 * sigma * sigma))
    return k / k.sum()


@partial(jax.jit, static_argnames=("kernel_size",))
def gaussian_blur_u8(
    image: jax.Array, kernel: jax.Array, *, kernel_size: int = BLUR_KERNEL_SIZE
) -> jax.Array:
    """Blur a (H, W) uint8 image; borders copied from the original.

    Interior pixels: round-half-away(float conv), matching ``std::round``
    over the positive convolution sums (reference ``:341-355``).
    """
    half = kernel_size // 2
    img = image.astype(jnp.float32)[None, None]  # NCHW
    ker = kernel.astype(jnp.float32)[None, None]  # OIHW
    conv = jax.lax.conv_general_dilated(
        img, ker, window_strides=(1, 1), padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    interior = jnp.floor(conv + 0.5).astype(jnp.uint8)
    out = jnp.pad(interior, ((half, half), (half, half)))
    h, w = image.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    border = (row < half) | (row >= h - half) | (col < half) | (col >= w - half)
    return jnp.where(border, image, out)


class BriefPattern(NamedTuple):
    """Fixed sampling pattern, generated once (pytree of device arrays)."""

    p1: jax.Array  # (P, 2) int32 — first point offsets (x, y)
    p2: jax.Array  # (P, 2) int32 — second point offsets
    pair_valid: jax.Array  # (P,) bool — survived rejection sampling


def generate_brief_pattern(
    num_pairs: int, patch_size: int, seed: int = 42
) -> BriefPattern:
    """Gaussian point-pair pattern with the reference's rejection rule.

    N(0,1)·(patch/2) coordinates; a pair is kept only if all four coords
    satisfy ``|c| < scale`` — rejected pairs are dropped, not resampled
    (reference ``feature_detector.cpp:296-311``), so ``pair_valid`` marks the
    survivors.  The PRNG differs from the reference's libstdc++ engine (the
    exact stream is an implementation detail there, fixed-per-run either
    way); determinism per ``seed`` is the contract.
    """
    rng = np.random.default_rng(seed)
    scale = patch_size / 2.0
    coords = rng.normal(0.0, 1.0, size=(num_pairs, 4)) * scale
    keep = np.all(np.abs(coords) < scale, axis=1)
    ints = coords.astype(np.int32)  # C-style trunc toward zero
    p1 = np.where(keep[:, None], ints[:, 0:2], 0)
    p2 = np.where(keep[:, None], ints[:, 2:4], 0)
    return BriefPattern(
        p1=jnp.asarray(p1), p2=jnp.asarray(p2), pair_valid=jnp.asarray(keep)
    )


def _gather_pixels(image: jax.Array, xy: jax.Array) -> jax.Array:
    """Gather image[y, x] for (..., 2) int coordinate arrays (no clipping)."""
    h, w = image.shape
    x = jnp.clip(xy[..., 0], 0, w - 1)
    y = jnp.clip(xy[..., 1], 0, h - 1)
    return image[y, x]


def compute_orientations(
    image_blurred: jax.Array, kps: KeypointSet, patch_size: int
) -> jax.Array:
    """Intensity-centroid angles (degrees) for every keypoint at once.

    Patches are gathered from the blurred image (the reference computes
    orientation after blurring, ``feature_detector.cpp:33-40``).
    """
    radius = patch_size // 2
    h, w = image_blurred.shape
    xi = kps.xy[..., 0].astype(jnp.int32)
    yi = kps.xy[..., 1].astype(jnp.int32)

    offs = jnp.arange(-radius, radius + 1)
    uu, vv = jnp.meshgrid(offs, offs, indexing="xy")  # (S, S) u: x-offset, v: y-offset
    disc = (uu * uu + vv * vv) <= radius * radius

    # (K, S, S) gathered intensities
    gx = xi[:, None, None] + uu[None]
    gy = yi[:, None, None] + vv[None]
    vals = image_blurred[jnp.clip(gy, 0, h - 1), jnp.clip(gx, 0, w - 1)].astype(jnp.float32)

    m01 = jnp.sum(jnp.where(disc[None], vals * vv[None].astype(jnp.float32), 0.0), axis=(1, 2))
    m10 = jnp.sum(jnp.where(disc[None], vals * uu[None].astype(jnp.float32), 0.0), axis=(1, 2))

    in_bounds = (
        (xi - radius >= 0) & (xi + radius < w) & (yi - radius >= 0) & (yi + radius < h)
    )
    angle = jnp.arctan2(m01, m10) * (180.0 / jnp.pi)
    return jnp.where(in_bounds & kps.valid, angle, 0.0).astype(jnp.float32)


def compute_brief_descriptors(
    image_blurred: jax.Array,
    kps: KeypointSet,
    angles_deg: jax.Array,
    pattern: BriefPattern,
    num_pairs: int,
    patch_size: int,
) -> jax.Array:
    """Steered BRIEF for all keypoints: (K, num_pairs/8) uint8.

    Vectorised equivalent of reference ``feature_detector.cpp:233-284``
    including the skip-without-advancing bit compaction.
    """
    h, w = image_blurred.shape
    desc_bits = num_pairs  # descriptorSize * 8
    n_bytes = num_pairs // 8

    theta = angles_deg * (jnp.pi / 180.0)
    cos_t = jnp.cos(theta)[:, None]  # (K, 1)
    sin_t = jnp.sin(theta)[:, None]

    p1 = pattern.p1.astype(jnp.float32)  # (P, 2)
    p2 = pattern.p2.astype(jnp.float32)

    def rotate(p):
        x = p[None, :, 0] * cos_t - p[None, :, 1] * sin_t  # (K, P)
        y = p[None, :, 0] * sin_t + p[None, :, 1] * cos_t
        # C-style int cast truncates toward zero.
        return x.astype(jnp.int32), y.astype(jnp.int32)

    x1, y1 = rotate(p1)
    x2, y2 = rotate(p2)
    xi = kps.xy[..., 0].astype(jnp.int32)[:, None]
    yi = kps.xy[..., 1].astype(jnp.int32)[:, None]
    x1, y1, x2, y2 = x1 + xi, y1 + yi, x2 + xi, y2 + yi

    in_img = (
        (x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h)
        & (x2 >= 0) & (x2 < w) & (y2 >= 0) & (y2 < h)
    )
    valid_pair = in_img & pattern.pair_valid[None, :]  # (K, P)

    i1 = _gather_pixels(image_blurred, jnp.stack([x1, y1], axis=-1))
    i2 = _gather_pixels(image_blurred, jnp.stack([x2, y2], axis=-1))
    bit_val = (i1 < i2) & valid_pair  # (K, P)

    # Skip-without-advancing: bit position = exclusive cumsum of validity.
    pos = jnp.cumsum(valid_pair.astype(jnp.int32), axis=1) - 1  # (K, P)
    in_range = valid_pair & (pos < desc_bits)

    # Scatter bits to their compacted positions (out-of-range → dropped).
    # Positions are unique per keypoint (cumsum of a 0/1 mask), so a
    # scatter-max is exact; far cheaper than a (K, P, bits) one-hot.
    pos_safe = jnp.where(in_range, pos, desc_bits)  # desc_bits → dropped
    bits = (
        jnp.zeros((bit_val.shape[0], desc_bits), dtype=jnp.uint8)
        .at[jnp.arange(bit_val.shape[0])[:, None], pos_safe]
        .max(bit_val.astype(jnp.uint8), mode="drop")
        .astype(bool)
    )

    # Border rule: all-zero descriptor near the border (patch/2 margin).
    radius = patch_size // 2
    xk = kps.xy[..., 0].astype(jnp.int32)
    yk = kps.xy[..., 1].astype(jnp.int32)
    ok = (
        (xk - radius >= 0) & (xk + radius < w) & (yk - radius >= 0) & (yk + radius < h)
        & kps.valid
    )
    bits = bits & ok[:, None]

    # Pack LSB-first into bytes.
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).astype(jnp.uint8)
    packed = jnp.sum(
        bits.reshape(bits.shape[0], n_bytes, 8).astype(jnp.uint8) * weights[None, None, :],
        axis=-1,
        dtype=jnp.uint8,
    )
    return packed
