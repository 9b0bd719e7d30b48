#!/usr/bin/env python
"""Per-stage timing of the VO pipeline on the current backend.

Each stage is jitted in isolation and timed at steady state over the same
batch-16 KITTI fixture chunk the headline benchmark uses, so stage costs add
up to (roughly) the per-chunk cost of the fused pipeline.  Used to decide
where the next kernel goes; results land in BASELINE.md.
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.common.camera import Camera, undistort_image
from tpuslam.config.schema import SlamConfig
from tpuslam.frontend.matcher import match_descriptors
from tpuslam.frontend.pose import estimate_relative_pose
from tpuslam.model.slam import SlamPipeline
from tpuslam.pre.stream import FrameStream


from tools.microbench import chained_timeit, repeat_timeit


def timeit(fn, *args, n=None):
    return repeat_timeit(fn, *args, reps=24, n=1)


def main() -> None:
    batch = 16
    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=batch)
    pipeline = SlamPipeline(camera, config)
    det = pipeline.detector

    stream = FrameStream(REPO_ROOT / "tests" / "data" / "images")
    base = [stream.read_frame(i)[0] for i in range(stream.total_frames)]
    frames = jnp.asarray(
        np.stack([base[i % len(base)] for i in range(batch)])
    )

    ms = 1e3 / batch  # per-frame milliseconds from per-chunk seconds

    # undistort
    und_fn = jax.jit(
        jax.vmap(
            lambda f: undistort_image(
                f, pipeline._undistort_idx, pipeline._undistort_valid, normalize=False
            )
        )
    )
    t = timeit(und_fn, frames)
    print(f"undistort            {t * ms:8.3f} ms/frame")
    und = und_fn(frames)

    # fused blur+FAST+score (pallas) or XLA fallback
    c = det.config
    if det.use_pallas:
        from tpuslam.kernels.frontend_pallas import fused_frontend_batch

        ff = partial(
            fused_frontend_batch,
            threshold=c.intensity_threshold,
            contiguous=c.contiguous_pixels_threshold,
        )
        t = timeit(ff, und)
        print(f"blur+FAST (pallas)   {t * ms:8.3f} ms/frame")
        blur, corner, score = ff(und)
    else:
        from tpuslam.frontend.brief import gaussian_blur_u8
        from tpuslam.frontend.fast import fast_response_and_mask

        blur = jax.jit(jax.vmap(lambda im: gaussian_blur_u8(im, det.blur_kernel)))(und)
        corner, score = jax.jit(
            jax.vmap(
                partial(
                    fast_response_and_mask,
                    threshold=c.intensity_threshold,
                    contiguous=c.contiguous_pixels_threshold,
                )
            )
        )(und)

    # NMS + topk select
    from tpuslam.frontend.fast import select_keypoints

    sel = jax.jit(
        jax.vmap(
            lambda co, sc: select_keypoints(
                co,
                sc,
                nms=c.non_max_suppression,
                window=c.suppression_window_size,
                max_keypoints=c.max_keypoints,
            )
        )
    )
    t = timeit(sel, corner, score)
    print(f"NMS+topk             {t * ms:8.3f} ms/frame")
    kps = sel(corner, score)

    # orientation
    from tpuslam.frontend.brief import compute_orientations

    orient = jax.jit(
        jax.vmap(lambda bl, k: compute_orientations(bl, k, c.patch_size))
    )
    t = timeit(orient, blur, kps)
    print(f"orientation          {t * ms:8.3f} ms/frame")
    angles = orient(blur, kps)

    # BRIEF (quantized MXU path)
    from tpuslam.frontend.brief import compute_brief_descriptors_quantized

    brief = jax.jit(
        jax.vmap(
            lambda bl, k, a: compute_brief_descriptors_quantized(
                bl,
                k,
                a,
                det.pattern,
                det.bin_weights,
                c.num_brief_pairs,
                c.patch_size,
                c.brief_quantized_bins,
            )
        )
    )
    t = timeit(brief, blur, kps, angles)
    print(f"BRIEF (quantized)    {t * ms:8.3f} ms/frame")
    desc = brief(blur, kps, angles)

    # matcher (consecutive pairs within the chunk)
    mcfg = config.matcher
    desc_q = jnp.concatenate([desc[:1], desc[:-1]], axis=0)
    match_fn = jax.jit(
        jax.vmap(
            lambda d1, d2, k1v, k2v, k1x, k2x: match_descriptors(
                d1,
                d2,
                k1v,
                k2v,
                k1x,
                k2x,
                ratio_threshold=mcfg.ratio_test_threshold,
                max_jump_radius=mcfg.max_jump_radius,
                use_ratio_test=mcfg.use_ratio_test,
                filter_matches=False,
                use_spatial_penalty=True,
            )
        )
    )
    t = timeit(match_fn, desc_q, desc, kps.valid, kps.valid, kps.xy, kps.xy)
    print(f"match                {t * ms:8.3f} ms/frame")
    match = match_fn(desc_q, desc, kps.valid, kps.valid, kps.xy, kps.xy)

    # pose RANSAC
    pcfg = config.pose
    q = jnp.maximum(match.query_idx, 0)
    tr = jnp.maximum(match.train_idx, 0)
    pts1 = jnp.take_along_axis(kps.xy, q[..., None], axis=1)
    pts2 = jnp.take_along_axis(kps.xy, tr[..., None], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    K = pipeline._K
    pose_fn = jax.jit(
        jax.vmap(
            lambda p1, p2, v, k: estimate_relative_pose(
                p1,
                p2,
                v,
                K,
                k,
                num_hypotheses=pcfg.num_hypotheses,
                sample_size=pcfg.sample_size,
                inlier_threshold_px=pcfg.inlier_threshold_px,
                min_matches=pcfg.min_matches,
            )
        )
    )
    t = timeit(pose_fn, pts1, pts2, match.valid, keys)
    print(f"pose RANSAC          {t * ms:8.3f} ms/frame")
    res = pose_fn(pts1, pts2, match.valid, keys)

    # triangulation (as used for scale propagation)
    from tpuslam.frontend.pose import triangulate_matched_points

    tri = jax.jit(
        jax.vmap(lambda R, t_, p1, p2: triangulate_matched_points(K, R, t_, p1, p2))
    )
    t = timeit(tri, res.R, res.t, pts1, pts2)
    print(f"triangulation        {t * ms:8.3f} ms/frame")

    # full chunk program for comparison
    state = pipeline.initial_state()
    valid = jnp.ones(batch, bool)
    key = jax.random.PRNGKey(0)
    t = chained_timeit(lambda f: pipeline._chunk_fn(f, valid, state, key)[0].poses, frames, n=8)
    print(f"full chunk           {t * ms:8.3f} ms/frame  ({batch / t:.1f} FPS)")


if __name__ == "__main__":
    main()
