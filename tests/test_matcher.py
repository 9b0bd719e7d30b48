"""Matcher golden tests against the scalar oracle + end-to-end on real frames."""

import jax.numpy as jnp
import numpy as np

from tests.golden.reference_impl import match_hamming
from tpuslam.config.schema import DetectorConfig, MatcherConfig
from tpuslam.frontend.detector import FeatureDetector
from tpuslam.frontend.fast import KeypointSet
from tpuslam.frontend.matcher import FeatureMatcher, match_descriptors

RNG = np.random.default_rng(3)


def make_kps(pts, cap=None):
    pts = np.asarray(pts, np.float32)
    cap = cap or len(pts)
    xy = np.zeros((cap, 2), np.float32)
    xy[: len(pts)] = pts
    valid = np.zeros(cap, bool)
    valid[: len(pts)] = True
    return KeypointSet(
        xy=jnp.asarray(xy),
        response=jnp.zeros(cap, jnp.float32),
        angle=jnp.zeros(cap, jnp.float32),
        valid=jnp.asarray(valid),
    )


def as_match_list(ms):
    out = []
    for q, t, d, v in zip(
        np.asarray(ms.query_idx), np.asarray(ms.train_idx), np.asarray(ms.distance),
        np.asarray(ms.valid),
    ):
        if v:
            out.append((int(q), int(t), float(d)))
    return out


def test_matches_oracle_no_keypoints():
    d1 = RNG.integers(0, 256, (40, 32)).astype(np.uint8)
    d2 = RNG.integers(0, 256, (60, 32)).astype(np.uint8)
    got = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(40, bool), jnp.ones(60, bool),
        use_ratio_test=True, ratio_threshold=0.9,
        filter_matches=False, use_spatial_penalty=False,
    )
    want = match_hamming(d1, d2, None, None, 0.9, True)
    assert sorted(as_match_list(got)) == sorted(want)


def test_matches_oracle_with_spatial_penalty():
    n1, n2 = 30, 35
    d1 = RNG.integers(0, 256, (n1, 32)).astype(np.uint8)
    d2 = RNG.integers(0, 256, (n2, 32)).astype(np.uint8)
    k1 = RNG.uniform(0, 1300, (n1, 2)).astype(np.float32)
    k2 = RNG.uniform(0, 1300, (n2, 2)).astype(np.float32)
    got = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(n1, bool), jnp.ones(n2, bool),
        jnp.asarray(k1), jnp.asarray(k2),
        use_ratio_test=True, ratio_threshold=0.8,
        filter_matches=False, use_spatial_penalty=True,
    )
    want = match_hamming(
        d1, d2, [tuple(p) for p in k1], [tuple(p) for p in k2], 0.8, True
    )
    assert sorted(as_match_list(got)) == sorted(want)


def test_filter_top_k():
    d1 = RNG.integers(0, 256, (50, 32)).astype(np.uint8)
    d2 = RNG.integers(0, 256, (50, 32)).astype(np.uint8)
    full = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(50, bool), jnp.ones(50, bool),
        use_ratio_test=False, filter_matches=False, use_spatial_penalty=False,
    )
    topk = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(50, bool), jnp.ones(50, bool),
        use_ratio_test=False, filter_matches=True, good_matches_count=10,
        use_spatial_penalty=False,
    )
    full_list = sorted(as_match_list(full), key=lambda m: (m[2], m[0]))
    got = as_match_list(topk)
    assert len(got) == 10
    # distances sorted ascending, equal to the 10 smallest overall
    assert [m[2] for m in got] == [m[2] for m in full_list[:10]]


def test_invalid_rows_never_match():
    d1 = np.zeros((4, 32), np.uint8)
    d2 = np.zeros((4, 32), np.uint8)
    v1 = jnp.asarray([True, True, False, False])
    v2 = jnp.asarray([True, False, True, False])
    got = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), v1, v2,
        use_ratio_test=False, filter_matches=False, use_spatial_penalty=False,
    )
    ml = as_match_list(got)
    assert all(q in (0, 1) for q, _, _ in ml)
    assert all(t in (0, 2) for _, t, _ in ml)


def test_single_train_descriptor_ratio_passes():
    # secondBest stays INT_MAX → ratio test passes (reference behaviour)
    d1 = RNG.integers(0, 256, (3, 32)).astype(np.uint8)
    d2 = d1[:1].copy()
    got = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(3, bool), jnp.ones(1, bool),
        use_ratio_test=True, ratio_threshold=0.5,
        filter_matches=False, use_spatial_penalty=False,
    )
    want = match_hamming(d1, d2, None, None, 0.5, True)
    assert sorted(as_match_list(got)) == sorted(want)
    assert len(want) >= 1  # the identical descriptor matches at distance 0


def test_end_to_end_real_frames(kitti_frames):
    """Two consecutive KITTI frames: detect, describe, match — sane stats."""
    det = FeatureDetector(DetectorConfig(max_keypoints=512))
    matcher = FeatureMatcher(MatcherConfig())
    k1, d1 = det.detect_and_compute(jnp.asarray(kitti_frames[0]))
    k2, d2 = det.detect_and_compute(jnp.asarray(kitti_frames[1]))
    assert int(k1.count()) > 100
    assert int(k2.count()) > 100
    ms = matcher.match(d1, d2, k1, k2)
    n = int(ms.count())
    assert n == 20  # GoodMatchesCount
    # matched keypoints should move only a little between consecutive frames
    q = np.asarray(ms.query_idx)[np.asarray(ms.valid)]
    t = np.asarray(ms.train_idx)[np.asarray(ms.valid)]
    p1 = np.asarray(k1.xy)[q]
    p2 = np.asarray(k2.xy)[t]
    flow = np.linalg.norm(p1 - p2, axis=1)
    assert np.median(flow) < 100.0
