"""Fused Pallas frontend kernel vs the XLA reference paths (interpret mode
on CPU; the real TPU lowering is exercised by bench/pipeline drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.frontend.brief import gaussian_blur_u8, gaussian_kernel
from tpuslam.frontend.fast import fast_response_and_mask


@pytest.fixture(scope="module")
def crop(kitti_frames):
    # multiple of nothing in particular — exercises padding paths
    return np.ascontiguousarray(kitti_frames[0][100:400, 300:1000])


@pytest.fixture(scope="module")
def fused_out(crop):
    from tpuslam.kernels import frontend_pallas as fp

    with jax.disable_jit(False):
        # interpret mode so the kernel runs on CPU in tests
        orig = fp.pl.pallas_call
        def interp_call(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)
        fp.pl.pallas_call = interp_call
        try:
            out = fp.fused_frontend_batch.__wrapped__(
                jnp.asarray(crop)[None], threshold=20, contiguous=12
            )
            out = tuple(o[0] for o in out)
        finally:
            fp.pl.pallas_call = orig
    return out


def test_fused_blur_matches_xla(crop, fused_out):
    blur_k, _, _ = fused_out
    want = np.asarray(gaussian_blur_u8(jnp.asarray(crop), jnp.asarray(gaussian_kernel())))
    np.testing.assert_array_equal(np.asarray(blur_k), want)


def test_fused_fast_matches_xla(crop, fused_out):
    _, corner_k, score_k = fused_out
    corner, score = fast_response_and_mask(jnp.asarray(crop), 20, 12)
    np.testing.assert_array_equal(np.asarray(corner_k), np.asarray(corner))
    # score agrees wherever there is a corner (only place it is consumed)
    ys, xs = np.nonzero(np.asarray(corner))
    np.testing.assert_array_equal(
        np.asarray(score_k)[ys, xs], np.asarray(score)[ys, xs]
    )
