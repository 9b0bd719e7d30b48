"""Fused image-frontend Pallas kernel: Gaussian blur + FAST corner/score.

One pass over the image computes everything the per-frame frontend needs
from the raw pixels — the 5×5 blur (for BRIEF/orientation) and the FAST
corner mask + SAD score — instead of separate XLA passes each streaming the
frame through HBM.  Layout follows the pallas_guide double-buffer-free halo
pattern: the (pre-padded) image stays in HBM/ANY; each grid row DMAs its
row-block plus HALO rows into VMEM scratch and emits halo-free outputs.

Semantics are identical to the XLA paths (`frontend.fast.fast_response_and_mask`,
`frontend.brief.gaussian_blur_u8` interiors); the callers still apply the
reference's border rules (copy borders for blur, 3-px exclusion for FAST).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.frontend.brief import gaussian_kernel
from tpuslam.frontend.fast import CIRCLE_OFFSETS

import os

HALO = 8  # covers FAST radius 3 + blur radius 2; keeps DMA slices 8-row aligned
BLOCK_H = int(os.environ.get("TPUSLAM_FRONTEND_BLOCK_H", "64"))


def _frontend_kernel(
    img_hbm,  # (B, n_blocks*BLOCK_H + 2*HALO, Wp) uint8 in ANY/HBM
    blur_ref,  # (1, BLOCK_H, Wp) uint8 out
    corner_ref,  # (1, BLOCK_H, Wp) uint8 out
    score_ref,  # (1, BLOCK_H, Wp) int32 out
    scratch,  # (BLOCK_H + 2*HALO, Wp) uint8 VMEM
    sem,
    *,
    threshold: int,
    contiguous: int,
    kernel_taps: tuple,
):
    b = pl.program_id(0)
    pid = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(pid * BLOCK_H, BLOCK_H + 2 * HALO)], scratch, sem
    )
    copy.start()
    copy.wait()

    wp = scratch.shape[1]
    w_out = wp - 2 * HALO

    def win(dy: int, dx: int) -> jax.Array:
        """(BLOCK_H, w_out) int32 window at offset (dy, dx)."""
        return jax.lax.slice(
            scratch[:],
            (HALO + dy, HALO + dx),
            (HALO + dy + BLOCK_H, HALO + dx + w_out),
        ).astype(jnp.int32)

    center = win(0, 0)

    # --- 5×5 Gaussian blur (float32 taps, round half away) -------------------
    acc = jnp.zeros(center.shape, jnp.float32)
    for (dy, dx, k) in kernel_taps:
        acc = acc + k * win(dy, dx).astype(jnp.float32)
    # Mosaic lacks a direct f32→u8 cast; hop through int32.
    blurred = jnp.floor(acc + 0.5).astype(jnp.int32).astype(jnp.uint8)

    # --- FAST: rolling-counter segment test (constant VMEM) ------------------
    # Materialising the (16, BLOCK_H, W) neighbour stack overflows VMEM; the
    # reference's own 32-iteration wrap-around counter formulation
    # (feature_detector.cpp:118-142) is the memory-light equivalent.
    lo = center - threshold
    hi = center + threshold
    card = {}
    bright_run = jnp.zeros(center.shape, jnp.int32)
    dark_run = jnp.zeros(center.shape, jnp.int32)
    seg = jnp.zeros(center.shape, bool)
    score = jnp.zeros(center.shape, jnp.int32)
    # A wrap-around run of length `contiguous` starts at index ≤ 15, so it
    # ends by index 14 + contiguous — iterations beyond that only re-detect
    # runs already seen in the first copy (bit-exact with the 32-iteration
    # formulation; the reference's loop is also 32, feature_detector.cpp:118).
    for i in range(min(2 * len(CIRCLE_OFFSETS), 15 + contiguous)):
        dx, dy = CIRCLE_OFFSETS[i % 16]
        nb = win(dy, dx)
        b = nb > hi
        d = nb < lo
        bright_run = jnp.where(b, bright_run + 1, 0)
        dark_run = jnp.where(d, dark_run + 1, 0)
        seg = seg | (bright_run >= contiguous) | (dark_run >= contiguous)
        if i < 16:
            score = score + jnp.abs(nb - center)
            if i % 16 in (0, 4, 8, 12):
                card[i] = (b, d)

    nb4 = sum(card[c][0].astype(jnp.int32) for c in (0, 4, 8, 12))
    nd4 = sum(card[c][1].astype(jnp.int32) for c in (0, 4, 8, 12))
    first_pair = card[0][0] | card[0][1] | card[8][0] | card[8][1]
    pretest = first_pair & ((nb4 >= 3) | (nd4 >= 3))
    corner = pretest & seg

    # Write the interior columns; the HALO-wide output margins are never
    # read (the host wrapper slices them away), so they stay unwritten.
    blur_ref[0, :, HALO : HALO + w_out] = blurred
    corner_ref[0, :, HALO : HALO + w_out] = corner.astype(jnp.int32).astype(jnp.uint8)
    score_ref[0, :, HALO : HALO + w_out] = score


@partial(jax.jit, static_argnames=("threshold", "contiguous"))
def fused_frontend_batch(
    images: jax.Array, *, threshold: int, contiguous: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run the fused kernel on (B, H, W) uint8 images.

    Returns ``(blurred u8, corner bool, score i32)``, each (B, H, W), with
    the same interior semantics as the XLA reference paths.  The batch is a
    native grid dimension (the ANY-memory-space manual-DMA pattern does not
    compose with vmap).
    """
    bsz, h, w = images.shape
    n_blocks = -(-h // BLOCK_H)
    hp = n_blocks * BLOCK_H
    wp = -(-(w + 2 * HALO) // 128) * 128
    padded = jnp.zeros((bsz, hp + 2 * HALO, wp), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, images, (0, HALO, HALO))

    k2d = gaussian_kernel()
    taps = tuple(
        (dy - 2, dx - 2, float(k2d[dy, dx])) for dy in range(5) for dx in range(5)
    )

    kernel = partial(
        _frontend_kernel, threshold=threshold, contiguous=contiguous, kernel_taps=taps
    )
    out_shape = (
        jax.ShapeDtypeStruct((bsz, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, hp, wp), jnp.int32),
    )
    blur, corner, score = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(
                (1, BLOCK_H, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(3)
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BLOCK_H + 2 * HALO, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's scoped stack holds every unrolled temporary live at
            # once; the default 16 MiB cap is far below the chip's VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(padded)

    if os.environ.get("TPUSLAM_FRONTEND_DOUBLE"):  # measurement aid only:
        # run the kernel a second time on a perturbed input and fold a
        # zero-valued function of its output in, so CSE/DCE cannot remove
        # it — the end-to-end FPS delta is the kernel's true cost.
        b2, c2, s2 = pl.pallas_call(
            kernel,
            grid=(bsz, n_blocks),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (1, BLOCK_H, wp), lambda b, i: (b, i, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(3)
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_H + 2 * HALO, wp), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(padded + jnp.uint8(1))
        zero = (
            jax.lax.optimization_barrier(s2[0, 0, 0]) * 0
        ).astype(jnp.int32)
        score = score + zero

    blur = jax.lax.slice(blur, (0, 0, HALO), (bsz, h, HALO + w))
    corner = jax.lax.slice(corner, (0, 0, HALO), (bsz, h, HALO + w)).astype(bool)
    score = jax.lax.slice(score, (0, 0, HALO), (bsz, h, HALO + w))

    # Reference border rules (cheap elementwise fixes outside the kernel).
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    blur_border = (row < 2) | (row >= h - 2) | (col < 2) | (col >= w - 2)
    blur = jnp.where(blur_border[None], images, blur)
    in_frame = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
    corner = corner & in_frame[None]
    return blur, corner, score


def fused_frontend(
    image: jax.Array, *, threshold: int, contiguous: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Single-image wrapper over :func:`fused_frontend_batch`."""
    blur, corner, score = fused_frontend_batch(
        image[None], threshold=threshold, contiguous=contiguous
    )
    return blur[0], corner[0], score[0]


# ---------------------------------------------------------------------------
# Fused blur + FAST + NMS-key kernel (round-5 data-movement pass)
# ---------------------------------------------------------------------------
# The separate NMS stage re-streamed the full-resolution planes through HBM
# several times: the kernel wrote corner (u8) + score (i32), select_keypoints
# read both to build the packed key, local_max_nms ran two SAME-padded
# reduce_window passes (each a read+write of a (H, W) u32 plane), and the
# surviving key was re-packed before tile pooling.  This kernel computes the
# FAST response over a (window−1)-row/col extended region (the image scratch
# already holds the halo) and emits ONE plane: the post-NMS packed key
# (uint32 score<<20 | inverted-raster-index, zero where suppressed) with the
# reference border rule applied in-register.  Downstream, the tile-pooled
# top-k consumes the key plane directly — bit-identical keypoints
# (test_pallas_frontend) at roughly a third of the NMS-path HBM traffic.

NMS_HALO = 16  # image halo: (window−1) NMS + 3 FAST, 8-row aligned, window ≤ 14

_IDX_BITS = 20


def _nms_kernel(
    img_hbm,  # (B, n_blocks*BLOCK_H + 2*NMS_HALO, Wp) uint8 in ANY/HBM
    blur_ref,  # (1, BLOCK_H, Wp) uint8 out
    key_ref,  # (1, BLOCK_H, Wp) uint32 out — post-NMS packed key
    scratch,  # (BLOCK_H + 2*NMS_HALO, Wp) uint8 VMEM
    sem,
    *,
    threshold: int,
    contiguous: int,
    kernel_taps: tuple,
    window: int,
    h_img: int,
    w_img: int,
    idx_shift: int,
):
    b = pl.program_id(0)
    pid = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(pid * BLOCK_H, BLOCK_H + 2 * NMS_HALO)], scratch, sem
    )
    copy.start()
    copy.wait()

    wp = scratch.shape[1]
    nh = window - 1  # NMS halo (rows and cols) beyond the output block
    er = BLOCK_H + 2 * nh  # extended rows
    c0 = NMS_HALO - nh  # extended-region col origin in scratch
    ec = wp - 2 * c0  # extended cols (uses the full scratch width)

    def win(dy: int, dx: int) -> jax.Array:
        """(er, ec) int32 window at offset (dy, dx) over the EXTENDED region."""
        return jax.lax.slice(
            scratch[:],
            (NMS_HALO - nh + dy, c0 + dx),
            (NMS_HALO - nh + dy + er, c0 + dx + ec),
        ).astype(jnp.int32)

    center = win(0, 0)

    # --- FAST over the extended region (same formulation as _frontend_kernel)
    lo = center - threshold
    hi = center + threshold
    card = {}
    bright_run = jnp.zeros(center.shape, jnp.int32)
    dark_run = jnp.zeros(center.shape, jnp.int32)
    seg = jnp.zeros(center.shape, bool)
    score = jnp.zeros(center.shape, jnp.int32)
    for i in range(min(2 * len(CIRCLE_OFFSETS), 15 + contiguous)):
        dx, dy = CIRCLE_OFFSETS[i % 16]
        nb = win(dy, dx)
        bmask = nb > hi
        dmask = nb < lo
        bright_run = jnp.where(bmask, bright_run + 1, 0)
        dark_run = jnp.where(dmask, dark_run + 1, 0)
        seg = seg | (bright_run >= contiguous) | (dark_run >= contiguous)
        if i < 16:
            score = score + jnp.abs(nb - center)
            if i % 16 in (0, 4, 8, 12):
                card[i] = (bmask, dmask)

    nb4 = sum(card[c][0].astype(jnp.int32) for c in (0, 4, 8, 12))
    nd4 = sum(card[c][1].astype(jnp.int32) for c in (0, 4, 8, 12))
    first_pair = card[0][0] | card[0][1] | card[8][0] | card[8][1]
    corner = first_pair & ((nb4 >= 3) | (nd4 >= 3)) & seg

    # --- reference border rule, in-register (global coordinates) ------------
    grow = (
        jax.lax.broadcasted_iota(jnp.int32, (er, ec), 0)
        + pid * BLOCK_H
        - nh
    )
    gcol = jax.lax.broadcasted_iota(jnp.int32, (er, ec), 1) + (c0 - NMS_HALO)
    in_frame = (
        (grow >= 3) & (grow < h_img - 3) & (gcol >= 3) & (gcol < w_img - 3)
    )
    corner = corner & in_frame

    # --- packed key + separable (2·window−1) running max ---------------------
    # All in INT32 with the sign bit flipped (unsigned order ≡ signed order
    # after x ^ 0x80000000): Mosaic has no unsigned vector max
    # (arith.maxui).  Bit patterns are identical to the uint32 key —
    # (score << 20) wraps into the sign bit exactly as the uint shift does.
    n = h_img * w_img
    idx = grow * w_img + gcol
    inv_idx = jnp.right_shift(jnp.int32(n - 1) - idx, idx_shift)
    sign = jnp.int32(-2147483648)  # 0x80000000
    key = jnp.where(
        corner,
        ((score << _IDX_BITS) | inv_idx) ^ sign,
        sign,  # "zero" in flipped space
    )

    # Separable square-window max in O(log window) shifts per axis: a
    # naive ±1..±(window−1) shift loop measured 594 vs 689 FPS end-to-end
    # (44 cross-sublane rolls dominated the kernel).  Doubling builds the
    # P-wide suffix max M_P(i) = max x[i..i+P−1] (P = next pow2 ≥ window)
    # in log2 P shifts; the centered (2·window−1) max is then the max of
    # two overlapping M_P lookups.  Shifts use pltpu.roll + sign-floor
    # edge masking (jnp.pad lowers to tpu.concatenate, which Mosaic
    # rejects here); the floor equals the flipped "zero", matching
    # reduce_window's SAME/init-0 edge semantics, and the halo in `key`
    # makes block-boundary maxima exact.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (er, ec), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (er, ec), 1)

    def shift(x, s: int, axis: int):
        """result[i] = x[i − s] along ``axis`` (sign floor out of range)."""
        if s == 0:
            return x
        n_ax = er if axis == 0 else ec
        iota = rows_i if axis == 0 else cols_i
        if s > 0:
            return jnp.where(iota >= s, pltpu.roll(x, s, axis), sign)
        return jnp.where(iota < n_ax + s, pltpu.roll(x, n_ax + s, axis), sign)

    P = 1
    while P < window:
        P *= 2

    def window_max(x, axis: int):
        m = x  # suffix max over [i, i+P)
        k = 1
        while k < P:
            m = jnp.maximum(m, shift(m, -k, axis))
            k *= 2
        # [i−(w−1), i+(w−1)] = [i−(w−1), ...] ∪ [i−(P−w), ...] (overlap ok)
        return jnp.maximum(
            shift(m, window - 1, axis), shift(m, P - window, axis)
        )

    col_max = window_max(window_max(key, 0), 1)
    keep = corner & (key == col_max) & (key > sign)
    keep_key = jnp.where(keep, key ^ sign, 0).astype(jnp.uint32)

    # --- 5×5 blur on the CENTER block only -----------------------------------
    def cwin(dy: int, dx: int) -> jax.Array:
        # Mosaic has no direct u8→f32 cast; hop through int32.
        return jax.lax.slice(
            scratch[:],
            (NMS_HALO + dy, NMS_HALO + dx),
            (NMS_HALO + dy + BLOCK_H, NMS_HALO + dx + (wp - 2 * NMS_HALO)),
        ).astype(jnp.int32).astype(jnp.float32)

    acc = jnp.zeros((BLOCK_H, wp - 2 * NMS_HALO), jnp.float32)
    for (dy, dx, k) in kernel_taps:
        acc = acc + k * cwin(dy, dx)
    blurred = jnp.floor(acc + 0.5).astype(jnp.int32).astype(jnp.uint8)

    blur_ref[0, :, NMS_HALO : wp - NMS_HALO] = blurred
    key_ref[0, :, NMS_HALO : wp - NMS_HALO] = jax.lax.slice(
        keep_key,
        (nh, NMS_HALO - c0),
        (nh + BLOCK_H, NMS_HALO - c0 + (wp - 2 * NMS_HALO)),
    )


@partial(jax.jit, static_argnames=("threshold", "contiguous", "window"))
def fused_frontend_nms_batch(
    images: jax.Array, *, threshold: int, contiguous: int, window: int
) -> tuple[jax.Array, jax.Array]:
    """Blur + FAST + windowed NMS in one pass over (B, H, W) uint8 images.

    Returns ``(blurred u8 (B, H, W), keep_key u32 (B, H, W))`` where
    ``keep_key`` is the post-NMS packed (score, inverted-raster) key —
    exactly ``_packed_key(score, local_max_nms(corner, score, window))``
    of the XLA reference path with the border rules pre-applied.  Feed it
    to ``frontend.fast.select_from_key``.
    """
    assert window - 1 + 3 <= NMS_HALO, "window too large for NMS_HALO"
    bsz, h, w = images.shape
    n_blocks = -(-h // BLOCK_H)
    hp = n_blocks * BLOCK_H
    wp = -(-(w + 2 * NMS_HALO) // 128) * 128
    padded = jnp.zeros((bsz, hp + 2 * NMS_HALO, wp), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, images, (0, NMS_HALO, NMS_HALO))

    k2d = gaussian_kernel()
    taps = tuple(
        (dy - 2, dx - 2, float(k2d[dy, dx])) for dy in range(5) for dx in range(5)
    )
    n = h * w
    idx_shift = 0
    while (n >> idx_shift) > (1 << _IDX_BITS) - 1:
        idx_shift += 1

    kernel = partial(
        _nms_kernel,
        threshold=threshold,
        contiguous=contiguous,
        kernel_taps=taps,
        window=window,
        h_img=h,
        w_img=w,
        idx_shift=idx_shift,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bsz, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, hp, wp), jnp.uint32),
    )
    blur, key = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(
                (1, BLOCK_H, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(2)
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BLOCK_H + 2 * NMS_HALO, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(padded)

    blur = jax.lax.slice(blur, (0, 0, NMS_HALO), (bsz, h, NMS_HALO + w))
    key = jax.lax.slice(key, (0, 0, NMS_HALO), (bsz, h, NMS_HALO + w))

    # Reference blur border rule (first/last 2 rows/cols copy the source).
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    blur_border = (row < 2) | (row >= h - 2) | (col < 2) | (col >= w - 2)
    blur = jnp.where(blur_border[None], images, blur)
    return blur, key
