"""FeatureDetector facade: FAST detect + steered-BRIEF compute.

The TPU analog of the reference's ``FeatureDetector`` class
(``include/slam/frontend/feature_detector.hpp:48-135``): construction loads
and validates the YAML config and fixes the BRIEF pattern once; ``detect``,
``compute`` and ``detect_and_compute`` are jitted, batchable pure functions.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from tpuslam.config.schema import DetectorConfig
from tpuslam.frontend.brief import (
    BriefPattern,
    brief_bits_from_dots,
    build_brief_bin_weights,
    compute_brief_descriptors,
    compute_brief_descriptors_quantized,
    compute_orientations,
    disc_moment_weights,
    extract_brief_patches_i8,
    gaussian_blur_u8,
    gaussian_kernel,
    generate_brief_pattern,
    orientations_from_patches,
    quantize_angles,
)
from tpuslam.frontend.fast import KeypointSet, detect_keypoints, select_keypoints


class FeatureDetector:
    """Stateless-after-init detector; all methods are jit-compiled."""

    def __init__(self, config: DetectorConfig | str | Path):
        if not isinstance(config, DetectorConfig):
            config = DetectorConfig.from_yaml(config)
        self.config = config
        self.pattern: BriefPattern = generate_brief_pattern(
            config.num_brief_pairs, config.patch_size, seed=config.brief_seed
        )
        self.blur_kernel = jnp.asarray(gaussian_kernel())
        self.bin_weights = None
        self.bin_weights_3d = None
        if config.brief_quantized_bins > 0:
            W, _ = build_brief_bin_weights(
                self.pattern, config.patch_size, config.brief_quantized_bins
            )
            self.bin_weights = jnp.asarray(W)
            # (bins, S2p, P) layout for the Pallas own-bin kernel.
            bins = config.brief_quantized_bins
            s2p = W.shape[0]
            self.bin_weights_3d = jnp.asarray(
                W.reshape(s2p, bins, -1).transpose(1, 0, 2).copy()
            )
        self.moment_weights = jnp.asarray(disc_moment_weights(config.patch_size))
        # The fused Pallas kernels only lower on real TPUs.
        self.use_pallas = jax.default_backend() == "tpu"

    # --- detect ---------------------------------------------------------------
    def detect(self, image: jax.Array) -> KeypointSet:
        """FAST + NMS on one (H, W) uint8 image → fixed-capacity KeypointSet."""
        c = self.config
        return detect_keypoints(
            image,
            threshold=c.intensity_threshold,
            contiguous=c.contiguous_pixels_threshold,
            nms=c.non_max_suppression,
            window=c.suppression_window_size,
            max_keypoints=c.max_keypoints,
        )

    # --- compute --------------------------------------------------------------
    def compute(self, image: jax.Array, kps: KeypointSet) -> tuple[KeypointSet, jax.Array]:
        """Blur + orientation + BRIEF. Returns (keypoints-with-angles, descriptors).

        Descriptors: (K, num_brief_pairs/8) uint8; rows for invalid keypoints
        are all-zero.
        """
        return _compute_impl(
            image,
            kps,
            self.blur_kernel,
            self.pattern,
            self.bin_weights,
            self.config.num_brief_pairs,
            self.config.patch_size,
            self.config.brief_quantized_bins,
        )

    def detect_and_compute(self, image: jax.Array) -> tuple[KeypointSet, jax.Array]:
        """Fused path on TPU (one Pallas pass produces blur+FAST); XLA
        reference path elsewhere (bit-identical, see test_pallas_frontend)."""
        if self.use_pallas:
            kps, desc = self.detect_and_compute_batch(image[None])
            return jax.tree.map(lambda a: a[0], kps), desc[0]
        kps = self.detect(image)
        return self.compute(image, kps)

    # --- batched --------------------------------------------------------------
    def detect_and_compute_batch(self, images: jax.Array) -> tuple[KeypointSet, jax.Array]:
        """Batched detect+compute over (B, H, W) frames."""
        c = self.config
        if self.use_pallas and images.shape[-2] >= 64 and images.shape[-1] >= 128:
            from tpuslam.kernels.frontend_pallas import fused_frontend_batch

            blur, corner, score = fused_frontend_batch(
                images,
                threshold=c.intensity_threshold,
                contiguous=c.contiguous_pixels_threshold,
            )
            kps = jax.vmap(
                lambda co, sc: select_keypoints(
                    co, sc, nms=c.non_max_suppression,
                    window=c.suppression_window_size, max_keypoints=c.max_keypoints,
                )
            )(corner, score)
            if c.brief_quantized_bins > 0:
                return _compute_batch_fused(
                    blur, kps, self.pattern, self.bin_weights_3d,
                    self.moment_weights, c.num_brief_pairs, c.patch_size,
                    c.brief_quantized_bins,
                )
            return jax.vmap(
                lambda bl, k: _compute_from_blurred(
                    bl, k, self.pattern, self.bin_weights, c.num_brief_pairs,
                    c.patch_size, c.brief_quantized_bins,
                )
            )(blur, kps)
        return jax.vmap(lambda im: (lambda k: self.compute(im, k))(self.detect(im)))(
            images
        )


@partial(jax.jit, static_argnames=("num_pairs", "patch_size", "quantized_bins"))
def _compute_impl(
    image: jax.Array,
    kps: KeypointSet,
    blur_kernel: jax.Array,
    pattern: BriefPattern,
    bin_weights: jax.Array | None,
    num_pairs: int,
    patch_size: int,
    quantized_bins: int,
) -> tuple[KeypointSet, jax.Array]:
    blurred = gaussian_blur_u8(image, blur_kernel)
    return _compute_from_blurred(
        blurred, kps, pattern, bin_weights, num_pairs, patch_size, quantized_bins
    )


@partial(jax.jit, static_argnames=("num_pairs", "patch_size", "quantized_bins"))
def _compute_batch_fused(
    blurred: jax.Array,  # (B, H, W) uint8
    kps: KeypointSet,  # (B, K, ...) batched
    pattern: BriefPattern,
    bin_weights_3d: jax.Array,  # (bins, S2p, P) int8
    moment_weights: jax.Array,  # (S2p, 2) int8
    num_pairs: int,
    patch_size: int,
    quantized_bins: int,
) -> tuple[KeypointSet, jax.Array]:
    """Batched orientation + quantised BRIEF sharing one patch extraction.

    The TPU throughput path: patches are extracted once per keypoint,
    orientation moments are a (K, S2p)·(S2p, 2) int8 matmul over them, and
    the own-bin comparison dots come from the Pallas kernel that never
    materialises the (K, bins·P) tensor (``kernels/brief_pallas.py``).
    Bit-exact with the per-frame XLA quantised path (see test_brief).
    """
    from tpuslam.kernels.brief_pallas import (
        brief_own_bin_dots,
        extract_brief_patches_tpu,
    )

    h, w = blurred.shape[-2:]
    patches = extract_brief_patches_tpu(blurred, kps.xy, patch_size)
    angles = jax.vmap(
        lambda p, k: orientations_from_patches(
            p, moment_weights, k, patch_size, (h, w)
        )
    )(patches, kps)  # (B, K)
    bin_idx = quantize_angles(angles, quantized_bins)  # (B, K)
    own = brief_own_bin_dots(patches, bin_idx, bin_weights_3d)  # (B, K, P)
    desc = jax.vmap(
        lambda o, bi, k: brief_bits_from_dots(
            o, bi, k, pattern, quantized_bins, num_pairs, patch_size, (h, w)
        )
    )(own, bin_idx, kps)
    return kps._replace(angle=angles), desc


@partial(jax.jit, static_argnames=("num_pairs", "patch_size", "quantized_bins"))
def _compute_from_blurred(
    blurred: jax.Array,
    kps: KeypointSet,
    pattern: BriefPattern,
    bin_weights: jax.Array | None,
    num_pairs: int,
    patch_size: int,
    quantized_bins: int,
) -> tuple[KeypointSet, jax.Array]:
    angles = compute_orientations(blurred, kps, patch_size)
    if quantized_bins > 0 and bin_weights is not None:
        descriptors = compute_brief_descriptors_quantized(
            blurred, kps, angles, pattern, bin_weights, num_pairs, patch_size,
            quantized_bins,
        )
    else:
        descriptors = compute_brief_descriptors(
            blurred, kps, angles, pattern, num_pairs, patch_size
        )
    return kps._replace(angle=angles), descriptors
