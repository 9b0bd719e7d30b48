"""Full SlamSystem tests: VO + keyframes + map + BA + loop closure composed."""

from pathlib import Path

import numpy as np
import pytest

from tpuslam.common.camera import Camera
from tpuslam.config.schema import DetectorConfig, MatcherConfig, PoseConfig, SlamConfig
from tpuslam.model.system import SlamSystem
from tpuslam.pre.stream import FrameStream

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


@pytest.fixture(scope="module")
def system(data_dir):
    cam = Camera.from_yaml(CONFIGS / "camera.yml")
    cfg = SlamConfig(
        detector=DetectorConfig(max_keypoints=512),
        matcher=MatcherConfig(ratio_test_threshold=0.8),
        pose=PoseConfig(num_hypotheses=1024, inlier_threshold_px=2.0),
        batch_size=5,
    )
    return SlamSystem(
        cam,
        cfg,
        vocabulary=CONFIGS / "vocabulary.npz",
        keyframe_interval=2,
        ba_window=8,
        ba_interval=3,
        ba_iterations=5,
        max_map_points=4096,
    )


@pytest.fixture(scope="module")
def result(system, data_dir):
    stream = FrameStream(data_dir / "images")
    return system.run(stream.batches(5))


def test_system_trajectory(result):
    assert result["poses"].shape == (10, 4, 4)
    pos = result["poses"][:, :3, 3]
    # forward drive (z grows ~1 per frame at unit monocular scale), with BA
    # allowed to adjust poses moderately
    assert pos[-1, 2] > 6.0
    R = result["poses"][:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-3)


def test_system_map_populated(result):
    m = result["map"]
    assert int(np.asarray(m.kf_count)) == 5  # frames 0,2,4,6,8
    assert int(np.asarray(m.point_count)) > 100
    # every valid keyframe has observations
    obs_per_kf = np.asarray(m.obs_mask).sum(axis=1)
    assert (obs_per_kf[np.asarray(m.kf_valid)] > 0).sum() >= 4


def test_system_ba_ran_and_reduced_cost(result):
    assert len(result["ba_events"]) >= 1
    for ev in result["ba_events"]:
        assert ev["final_cost"] <= ev["initial_cost"] * 1.001


def test_system_no_false_loops(result):
    """A straight 10-frame forward drive must not close a loop."""
    assert result["loops"] == []


def test_system_stats(result):
    assert result["pose_ok"][1:].all()
    assert (result["num_inliers"][1:] > 30).all()
