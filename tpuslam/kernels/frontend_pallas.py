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
