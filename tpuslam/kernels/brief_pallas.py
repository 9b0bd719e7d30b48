"""Fused steered-BRIEF kernel: per-keypoint own-orientation-bin dot products.

The quantised MXU BRIEF path (``frontend/brief.py``) computes, for every
keypoint, the ±1-weighted patch dot products of *its own* orientation bin.
The XLA formulation materialises the full (K, bins·P) int32 dot tensor in
HBM (64 MB/frame at K=1024, bins=64, P=256) and then reduces it against a
one-hot bin mask — two full HBM round-trips of a tensor that is 98.4%
discarded (measured ~2 ms/frame of the round-1 BRIEF cost,
BASELINE.md).

This kernel keeps the reduction on-chip: the per-frame patch matrix stays
resident in VMEM while the 64 per-bin weight blocks stream through
(0.5 MB each, pipelined by the grid), each bin's dots are masked to the
keypoints owning that bin and accumulated into a VMEM-resident (K, P)
accumulator — the big tensor never exists.  Per frame the HBM traffic is
patches (2 MB) + weights (33 MB) + output (1 MB) instead of ~130 MB.

Semantics: bit-exact with the XLA one-hot path (integer arithmetic
throughout); see ``tests/test_brief.py``.  Reference behaviour contract:
``src/frontend/feature_detector.cpp:233-284`` (steered BRIEF bits).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_kernel(ys_ref, xs_ref, img_ref, out_ref, *, side: int):
    """Per-keypoint patch extraction from a VMEM-resident int32 image.

    XLA lowers a vmapped ``dynamic_slice`` to a serial gather (~100 ns per
    patch ≈ 1.6 ms/frame at K=1024 — the round-1 BRIEF bottleneck).  Here
    each patch is two aligned VMEM loads + two dynamic rotates: Mosaic only
    allows dynamic slice offsets that are provably 8-aligned (sublanes) /
    128-aligned (lanes), so the kernel loads the aligned covering strip and
    rotates the residual away.  Rotates must be 32-bit (hence the int32
    image) and shifts must be non-negative (negative dynamic shifts
    miscompile — verified empirically, see round-2 notes).
    """
    n0 = side + 8
    k_cap = out_ref.shape[1]

    def body(k, _):
        y = ys_ref[0, 0, k]
        x = xs_ref[0, 0, k]
        ya = pl.multiple_of((y // 8) * 8, 8)
        xt = pl.multiple_of((x // 128) * 128, 128)
        strip = img_ref[0, pl.ds(ya, n0), pl.ds(xt, 256)]  # (side+8, 256)
        strip = pltpu.roll(strip, (n0 - (y % 8)) % n0, axis=0)
        strip = pltpu.roll(strip, 256 - (x % 128), axis=1)
        out_ref[0, k] = (strip[:side, :side] - 128).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, k_cap, body, 0)


def extract_patches_pallas(
    image_padded_i32: jax.Array,  # (B, Hp, Wp) int32 — see wrapper contract
    yi: jax.Array,  # (B, K) int32 — patch-top row in padded coords
    xi: jax.Array,  # (B, K) int32 — patch-left col in padded coords
    side: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """(B, K, side, side) int8 patches (−128-shifted) at per-keypoint offsets.

    Contract: ``side`` is a multiple of 8; the padded image satisfies
    ``Hp ≥ ((max yi)//8)*8 + side + 8`` and ``Wp ≥ ((max xi)//128)*128 + 256``
    so every aligned covering strip is in bounds.
    """
    B, Hp, Wp = image_padded_i32.shape
    K = yi.shape[1]
    return pl.pallas_call(
        partial(_extract_kernel, side=side),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, Hp, Wp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K, side, side), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, side, side), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(yi[:, None, :], xi[:, None, :], image_padded_i32)


def extract_brief_patches_tpu(
    image_blurred: jax.Array,  # (B, H, W) uint8
    kps_xy: jax.Array,  # (B, K, 2) float32
    patch_size: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """(B, K, S2p) int8 flattened centred patches via the Pallas kernel.

    Drop-in TPU replacement for the XLA ``extract_brief_patches_i8`` (same
    layout, same −128 shift, same zero padding outside the image).
    """
    from tpuslam.frontend.brief import (
        padded_patch_len,
        patch_side,
        rotation_patch_half,
    )

    B, H, W = image_blurred.shape
    K = kps_xy.shape[1]
    half = rotation_patch_half(patch_size)
    side = patch_side(patch_size)
    s2p = padded_patch_len(patch_size)
    # Padded coords: patch top-left = keypoint position (top/left pad half);
    # bounds give every 8/128-aligned covering strip room on the right/bottom.
    Hp = ((H - 1) // 8) * 8 + side + 8
    Wp = ((W - 1) // 128) * 128 + 256
    padded = jnp.pad(
        image_blurred, ((0, 0), (half, Hp - H - half), (half, Wp - W - half))
    ).astype(jnp.int32)
    xi = jnp.clip(kps_xy[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(kps_xy[..., 1].astype(jnp.int32), 0, H - 1)
    patches = extract_patches_pallas(padded, yi, xi, side, interpret=interpret)
    flat = patches.reshape(B, K, side * side)
    if s2p != side * side:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, s2p - side * side)))
    return flat


def _own_bin_kernel(bins_ref, patches_ref, w_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dots = jax.lax.dot_general(
        patches_ref[0],
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (K, P)
    mask = bins_ref[0, 0][:, None] == j
    out_ref[0] += jnp.where(mask, dots, 0)


def brief_own_bin_dots(
    patches_i8: jax.Array,  # (B, K, S2p) int8 — flattened centred patches
    bin_idx: jax.Array,  # (B, K) int32 — orientation bin per keypoint
    weights: jax.Array,  # (bins, S2p, P) int8 — per-bin ±1 pair weights
    *,
    interpret: bool = False,
) -> jax.Array:
    """(B, K, P) int32: ``patches[b, k] · weights[bin_idx[b, k], :, :]``."""
    B, K, S2p = patches_i8.shape
    bins, _, P = weights.shape
    return pl.pallas_call(
        _own_bin_kernel,
        grid=(B, bins),
        in_specs=[
            pl.BlockSpec(
                (1, 1, K), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K, S2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, S2p, P), lambda b, j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K, P), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, P), jnp.int32),
        interpret=interpret,
    )(bin_idx[:, None, :], patches_i8, weights)
