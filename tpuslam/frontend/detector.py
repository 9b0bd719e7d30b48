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
    build_brief_bin_weights,
    compute_brief_descriptors,
    compute_brief_descriptors_quantized,
    compute_orientations,
    gaussian_blur_u8,
    gaussian_kernel,
    generate_brief_pattern,
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
        if config.brief_quantized_bins > 0:
            W, _ = build_brief_bin_weights(
                self.pattern, config.patch_size, config.brief_quantized_bins
            )
            self.bin_weights = jnp.asarray(W)
        # The fused Pallas blur+FAST kernel only lowers on real TPUs.
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
