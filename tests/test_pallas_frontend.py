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


class TestBriefPallas:
    """The patch-extraction + own-bin-dots kernels vs the XLA quantised path
    (interpret mode on CPU; bit-exactness on the real TPU is exercised by the
    pipeline drives and was verified at parity during development)."""

    @pytest.fixture(scope="class")
    def setup(self, kitti_frames):
        import numpy as np

        from tpuslam.frontend.brief import (
            build_brief_bin_weights,
            compute_brief_descriptors_quantized,
            compute_orientations,
            disc_moment_weights,
            gaussian_blur_u8,
            gaussian_kernel,
            generate_brief_pattern,
        )
        from tpuslam.frontend.fast import KeypointSet

        rng = np.random.default_rng(3)
        crop = np.stack(
            [kitti_frames[0][60:188, 300:556], kitti_frames[1][60:188, 300:556]]
        )  # (2, 128, 256)
        B, H, W = crop.shape
        K, bins, pairs, patch = 32, 8, 32, 31
        xy = np.stack(
            [rng.integers(0, W, (B, K)), rng.integers(0, H, (B, K))], axis=-1
        ).astype(np.float32)
        kps = KeypointSet(
            xy=jnp.asarray(xy),
            response=jnp.ones((B, K), jnp.float32),
            angle=jnp.zeros((B, K), jnp.float32),
            valid=jnp.asarray(rng.random((B, K)) > 0.2),
        )
        pattern = generate_brief_pattern(pairs, patch)
        W2, _ = build_brief_bin_weights(pattern, patch, bins)
        blur = jax.vmap(
            lambda im: gaussian_blur_u8(jnp.asarray(im), jnp.asarray(gaussian_kernel()))
        )(jnp.asarray(crop))
        angles = jax.vmap(lambda bl, k: compute_orientations(bl, k, patch))(
            blur, kps
        )
        desc_ref = jax.vmap(
            lambda bl, k, a: compute_brief_descriptors_quantized(
                bl, k, a, pattern, jnp.asarray(W2), pairs, patch, bins
            )
        )(blur, kps, angles)
        return dict(
            crop=crop, blur=blur, kps=kps, pattern=pattern, W2=W2,
            angles=angles, desc_ref=desc_ref, K=K, bins=bins, pairs=pairs,
            patch=patch,
        )

    def test_extract_patches_kernel_matches_xla(self, setup):
        from tpuslam.frontend.brief import extract_brief_patches_i8
        from tpuslam.kernels.brief_pallas import extract_brief_patches_tpu

        want = jax.vmap(
            lambda bl, k: extract_brief_patches_i8(bl, k, setup["patch"])
        )(setup["blur"], setup["kps"])
        got = extract_brief_patches_tpu(
            setup["blur"], setup["kps"].xy, setup["patch"], interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_compute_matches_quantized_xla(self, setup):
        import numpy as np

        from tpuslam.frontend.brief import (
            brief_bits_from_dots,
            extract_brief_patches_i8,
            disc_moment_weights,
            orientations_from_patches,
            quantize_angles,
        )
        from tpuslam.kernels.brief_pallas import brief_own_bin_dots

        patch, bins, pairs = setup["patch"], setup["bins"], setup["pairs"]
        blur, kps = setup["blur"], setup["kps"]
        h, w = blur.shape[-2:]
        mom_w = jnp.asarray(disc_moment_weights(patch))
        patches = jax.vmap(
            lambda bl, k: extract_brief_patches_i8(bl, k, patch)
        )(blur, kps)
        angles = jax.vmap(
            lambda p, k: orientations_from_patches(p, mom_w, k, patch, (h, w))
        )(patches, kps)
        # patch-moment orientation is integer-exact ⇒ equals the map-based one
        v = np.asarray(kps.valid)
        np.testing.assert_allclose(
            np.asarray(angles)[v], np.asarray(setup["angles"])[v], atol=2e-4
        )
        s2p = patches.shape[-1]
        W3 = jnp.asarray(
            setup["W2"].reshape(s2p, bins, pairs).transpose(1, 0, 2).copy()
        )
        bin_idx = quantize_angles(angles, bins)
        own = brief_own_bin_dots(patches, bin_idx, W3, interpret=True)
        desc = jax.vmap(
            lambda o, bi, k: brief_bits_from_dots(
                o, bi, k, setup["pattern"], bins, pairs, patch, (h, w)
            )
        )(own, bin_idx, kps)
        np.testing.assert_array_equal(
            np.asarray(desc), np.asarray(setup["desc_ref"])
        )


def test_fused_nms_key_matches_xla(crop):
    """The one-pass blur+FAST+NMS kernel's packed-key plane bit-equals the
    XLA chain (fast_response_and_mask → local_max_nms → _packed_key) with
    the blur border rule applied — the round-5 NMS data-movement fusion."""
    from tpuslam.frontend.fast import _packed_key, local_max_nms
    from tpuslam.kernels import frontend_pallas as fp

    window = 12
    orig = fp.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    fp.pl.pallas_call = interp_call
    try:
        blur_k, key_k = fp.fused_frontend_nms_batch.__wrapped__(
            jnp.asarray(crop)[None], threshold=20, contiguous=12,
            window=window,
        )
        blur_k, key_k = blur_k[0], key_k[0]
    finally:
        fp.pl.pallas_call = orig

    corner, score = fast_response_and_mask(jnp.asarray(crop), 20, 12)
    keep = local_max_nms(corner, score, window)
    want_key = _packed_key(score, keep)
    np.testing.assert_array_equal(np.asarray(key_k), np.asarray(want_key))
    want_blur = np.asarray(
        gaussian_blur_u8(jnp.asarray(crop), jnp.asarray(gaussian_kernel()))
    )
    np.testing.assert_array_equal(np.asarray(blur_k), want_blur)


def test_select_from_key_matches_select_keypoints(crop):
    """select_from_key on the post-NMS key plane reproduces
    select_keypoints exactly (same tile-pooled top-k)."""
    from tpuslam.frontend.fast import (
        _packed_key,
        local_max_nms,
        select_from_key,
        select_keypoints,
    )

    window, cap = 12, 256
    corner, score = fast_response_and_mask(jnp.asarray(crop), 20, 12)
    want = select_keypoints(
        corner, score, nms=True, window=window, max_keypoints=cap
    )
    keep = local_max_nms(corner, score, window)
    key = _packed_key(score, keep)
    got = select_from_key(key, window=window, max_keypoints=cap)
    for field in ("xy", "response", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)), np.asarray(getattr(want, field)),
            err_msg=field,
        )
