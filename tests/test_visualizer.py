"""Visualizer smoke tests: files written, shapes sane."""

import numpy as np
import jax.numpy as jnp

from tpuslam.config.schema import DetectorConfig, MatcherConfig
from tpuslam.frontend.detector import FeatureDetector
from tpuslam.frontend.matcher import FeatureMatcher
from tpuslam.post.visualizer import (
    draw_depth_matches,
    draw_keypoints,
    draw_matches,
    plot_trajectory,
)


def test_draw_keypoints(kitti_frames, tmp_path):
    det = FeatureDetector(DetectorConfig(max_keypoints=256))
    kps = det.detect(jnp.asarray(kitti_frames[0]))
    out = tmp_path / "kps.png"
    img = draw_keypoints(kitti_frames[0], kps, out)
    assert out.is_file()
    assert img.shape == (*kitti_frames[0].shape, 3)
    assert (img[..., 1] > img[..., 0]).any()  # green circles present


def test_draw_matches(kitti_frames, tmp_path):
    det = FeatureDetector(DetectorConfig(max_keypoints=256))
    m = FeatureMatcher(MatcherConfig())
    k1, d1 = det.detect_and_compute(jnp.asarray(kitti_frames[0]))
    k2, d2 = det.detect_and_compute(jnp.asarray(kitti_frames[1]))
    ms = m.match(d1, d2, k1, k2)
    out = tmp_path / "matches.png"
    img = draw_matches(kitti_frames[0], k1, kitti_frames[1], k2, ms, out)
    assert out.is_file()
    assert img.shape[1] == 2 * kitti_frames[0].shape[1]


def test_draw_depth_matches(kitti_frames, tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform([10, 10], [1300, 500], (50, 2))
    depths = rng.uniform(2, 50, 50)
    out = tmp_path / "depth.png"
    draw_depth_matches(kitti_frames[0], pts, depths, path=out)
    assert out.is_file()


def test_plot_trajectory(tmp_path):
    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 10, 20)
    poses[:, 2, 3] = np.linspace(0, 5, 20) ** 1.2
    out = tmp_path / "traj.png"
    plot_trajectory(poses, out, gt_poses=poses)
    assert out.is_file() and out.stat().st_size > 1000
