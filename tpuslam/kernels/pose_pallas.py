"""Fused MSAC hypothesis scoring for the batched-RANSAC essential matrix.

The XLA scoring path (``frontend/pose.py::sampson_error_sq`` over all
hypotheses) materialises several (H, M) float32 intermediates in HBM —
``Ex1``/``Eᵀx2`` component maps plus the error tensor, ~670 MB of traffic
per 16-frame chunk at H=2048, M=1024 (measured ~0.33 ms/frame) — for a
reduction whose output is just (H,) scores.

This kernel reformulates every per-match quantity as a dot product against
the 9-vector ``e = vec(E)``:

  * Sampson numerator:  ``x2ᵀE x1 = e · vec(x2 x1ᵀ)``
  * gradient terms:     ``(Ex1)_r = e · embed_r(x1)``,  ``(Eᵀx2)_c = e ·
    embed_c(x2)`` (rows/columns of E select strided 9-vector embeddings)

so one (H_blk, 9) × (9, 5M) MXU matmul produces numerator and all four
denominator components at once, and the truncated-loss reduction happens in
VMEM; HBM sees only E (72 KB), the precomputed match matrix P (320 KB) and
the (H,) scores per frame.  Scores match the XLA path to float32 rounding
(same truncation semantics; see ``tests/test_pose.py``).

Reference behaviour contract: the scoring inside ``cv::findEssentialMat``
RANSAC (``src/frontend/pose_estimator.cpp:40-47``); the MSAC truncation is
this framework's deviation, documented in ``frontend/pose.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _msac_kernel(e_ref, p_ref, out_ref, *, m: int):
    e = e_ref[...]  # (Hb, 9)
    big = jax.lax.dot_general(
        e,
        p_ref[...],  # (9, 5M)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Hb, 5M)
    err = big[:, :m]  # already scaled by 1/√thr upstream
    a1 = big[:, m : 2 * m]
    a2 = big[:, 2 * m : 3 * m]
    b1 = big[:, 3 * m : 4 * m]
    b2 = big[:, 4 * m :]
    denom = a1 * a1 + a2 * a2 + b1 * b1 + b2 * b2
    e2 = (err * err) / jnp.maximum(denom, 1e-18)
    out_ref[...] = jnp.sum(jnp.minimum(e2, 1.0), axis=-1)[None, :]


def msac_scores_pallas(
    E_flat: jax.Array,  # (H, 9) float32 — row-major vec(E) hypotheses
    P: jax.Array,  # (9, 5M) float32 — see build_msac_operand
    *,
    block_h: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(H,) truncated-Sampson (MSAC) scores; invalid matches contribute 0.

    Unbatched so ``jax.vmap`` can lift it over frames (the batching rule
    prepends a grid axis).
    """
    H = E_flat.shape[0]
    fm = P.shape[-1]
    m = fm // 5
    block_h = min(block_h, H)
    # The (1, H) output keeps the minor-most block dims Mosaic-tileable
    # even after a vmap prepends a batch dimension.
    out = pl.pallas_call(
        lambda e_ref, p_ref, out_ref: _msac_kernel(e_ref, p_ref, out_ref, m=m),
        grid=(H // block_h,),
        in_specs=[
            pl.BlockSpec((block_h, 9), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, fm), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        interpret=interpret,
    )(E_flat, P)
    return out[0]


def build_msac_operand(
    x1: jax.Array,  # (..., M, 2) normalised coords
    x2: jax.Array,  # (..., M, 2)
    valid: jax.Array,  # (..., M) bool
    thr: jax.Array,  # () squared Sampson threshold (normalised units)
) -> jax.Array:
    """(..., 9, 5M) operand packing numerator + gradient embeddings.

    Column blocks (each M wide, in match order):
      [vec(x2ₕx1ₕᵀ)/√thr | rows of E vs x1ₕ (r=0,1) | cols of E vs x2ₕ (c=0,1)]
    Invalid matches are zeroed in every block, so they score exactly 0.
    """
    dtype = x1.dtype
    ones = jnp.ones((*x1.shape[:-1], 1), dtype=dtype)
    x1h = jnp.concatenate([x1, ones], axis=-1)  # (..., M, 3)
    x2h = jnp.concatenate([x2, ones], axis=-1)
    v = valid.astype(dtype)[..., None]
    x1h = x1h * v
    x2h = x2h * v
    scale = 1.0 / jnp.sqrt(thr)
    t9 = (x2h[..., :, None] * x1h[..., None, :]).reshape(*x1.shape[:-1], 9) * scale
    z = jnp.zeros_like(x1h)
    # (Ex1)_0 = e[0:3]·x1h ; (Ex1)_1 = e[3:6]·x1h
    a1 = jnp.concatenate([x1h, z, z], axis=-1)  # (..., M, 9)
    a2 = jnp.concatenate([z, x1h, z], axis=-1)
    # (Eᵀx2)_0 = Σᵢ E[i,0]·x2h[i] → positions 0,3,6 ; (Eᵀx2)_1 → 1,4,7
    m_shape = (*x1.shape[:-1], 9)
    b1 = jnp.zeros(m_shape, dtype).at[..., 0::3].set(x2h)
    b2 = jnp.zeros(m_shape, dtype).at[..., 1::3].set(x2h)
    # (..., 5M, 9) → (..., 9, 5M)
    stacked = jnp.concatenate([t9, a1, a2, b1, b2], axis=-2)
    return jnp.swapaxes(stacked, -1, -2)
