"""Loop closure tests.

Two layers of coverage:

  * **gating behaviour** on the reference's 10-frame revisit sequence
    (``images_test_loop2``), mirroring ``test/backend/test_loop_closure.cpp``
    — BoW retrieval must propose keyframe 0 for the last frame;
  * **end-to-end detection with geometric verification** on the KITTI
    fixture frames, where keyframe 0 carries *real* triangulated map points
    (frames 0→1) and the query is frame 2, with the indoor loop frames as
    BoW distractors.  (The reference test fakes planar map points
    ``(x, y, 1.0)``, ``test_loop_closure.cpp:66-68`` — a degenerate
    configuration for DLT-PnP; that test also cannot fail, ``:85-91``.
    These tests assert for real.)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.loop_closure import LoopClosure
from tpuslam.backend.vocabulary import Vocabulary
from tpuslam.config.schema import DetectorConfig, LoopClosureConfig, MatcherConfig
from tpuslam.frontend.detector import FeatureDetector
from tpuslam.frontend.matcher import match_descriptors
from tpuslam.frontend.pose import estimate_relative_pose, triangulate_matched_points

CONFIGS = Path(__file__).resolve().parent.parent / "configs"

KITTI_K = np.array([[984.2439, 0, 690.0], [0, 980.8141, 233.1966], [0, 0, 1.0]])
LOOP_K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def detector():
    return FeatureDetector(DetectorConfig(max_keypoints=1024))


@pytest.fixture(scope="module")
def vocabulary():
    return Vocabulary.load(CONFIGS / "vocabulary.npz")


@pytest.fixture(scope="module")
def loop_features(detector, data_dir):
    import cv2

    out = []
    for p in sorted((data_dir / "images_test_loop2").glob("*.png")):
        img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        out.append(detector.detect_and_compute(jnp.asarray(img)))
    assert len(out) == 10
    return out


@pytest.fixture(scope="module")
def kitti_features(detector, kitti_frames):
    return [detector.detect_and_compute(jnp.asarray(f)) for f in kitti_frames[:3]]


@pytest.fixture(scope="module")
def loop_closure(vocabulary):
    return LoopClosure(
        vocabulary,
        LoopClosureConfig.from_yaml(CONFIGS / "loop_closure.yml"),
        MatcherConfig(ratio_test_threshold=0.8),
    )


def backprojected_points(kps, K, seed=0):
    """Map points along each keypoint's ray at random depths (non-planar)."""
    rng = np.random.default_rng(seed)
    xy = np.asarray(kps.xy)
    depths = rng.uniform(5, 15, len(xy))[:, None]
    rays = np.concatenate(
        [
            (xy[:, 0:1] - K[0, 2]) / K[0, 0],
            (xy[:, 1:2] - K[1, 2]) / K[1, 1],
            np.ones((len(xy), 1)),
        ],
        axis=1,
    )
    return jnp.asarray(rays * depths, jnp.float32)


# --- BoW retrieval on the reference's revisit sequence -------------------------


def test_bow_candidate_is_first_keyframe(loop_closure, loop_features):
    """Frame 9 revisits frame 0's view: BoW must propose keyframe 0
    (the retrieval half of the reference's expectation,
    test_loop_closure.cpp:81-83)."""
    db = loop_closure.new_db(max_keypoints=1024)
    for i, (kps, desc) in enumerate(loop_features[:9]):
        db = loop_closure.add_keyframe(
            db, i, desc, kps.xy, kps.valid,
            backprojected_points(kps, LOOP_K, seed=i),
        )
    kps, desc = loop_features[9]
    res = loop_closure.detect(db, desc, kps.xy, kps.valid, jnp.asarray(LOOP_K))
    assert int(res.candidate_id) == 0
    assert float(res.bow_score) > loop_closure.config.min_absolute_score


def test_min_db_size_gate(loop_closure, loop_features):
    """detect() on a too-small database → no loop (loop_closure.cpp:114-116)."""
    db = loop_closure.new_db(max_keypoints=1024)
    kps0, desc0 = loop_features[0]
    db = loop_closure.add_keyframe(
        db, 0, desc0, kps0.xy, kps0.valid, backprojected_points(kps0, LOOP_K)
    )
    kps, desc = loop_features[9]
    res = loop_closure.detect(db, desc, kps.xy, kps.valid, jnp.asarray(LOOP_K))
    assert not bool(res.success)


def test_min_frames_difference_gate(loop_closure, loop_features):
    """Keyframes within MinFramesDifference of the last are skipped
    (loop_closure.cpp:130-132)."""
    db = loop_closure.new_db(max_keypoints=1024)
    for i in (7, 8):
        kps, desc = loop_features[i]
        db = loop_closure.add_keyframe(
            db, i, desc, kps.xy, kps.valid, backprojected_points(kps, LOOP_K)
        )
    kps, desc = loop_features[8]
    res = loop_closure.detect(db, desc, kps.xy, kps.valid, jnp.asarray(LOOP_K))
    assert not bool(res.success)
    assert int(res.candidate_id) == -1


# --- end-to-end: real triangulated map points + geometric verification ---------


@pytest.fixture(scope="module")
def kitti_keyframe0(kitti_features):
    """Keyframe 0 with map points triangulated from KITTI frames 0→2.

    The wider 0→2 baseline keeps triangulated depths accurate enough that
    the *interpolating* frame 1 reprojects within the 2 px PnP threshold
    (0→1 triangulation reprojected into frame 2 does not — depth noise
    from a 1-baseline doubles when extrapolated)."""
    (k0, d0), _, (k2, d2) = kitti_features
    K = jnp.asarray(KITTI_K, jnp.float32)
    ms = match_descriptors(
        d0, d2, k0.valid, k2.valid, k0.xy, k2.xy,
        ratio_threshold=0.8, use_ratio_test=True, filter_matches=False,
    )
    q = jnp.maximum(ms.query_idx, 0)
    t = jnp.maximum(ms.train_idx, 0)
    pose = estimate_relative_pose(
        k0.xy[q], k2.xy[t], ms.valid, K, jax.random.PRNGKey(0),
        inlier_threshold_px=2.0,
    )
    assert bool(pose.success)
    X = triangulate_matched_points(K, pose.R, pose.t, k0.xy[q], k2.xy[t])
    good = pose.inliers & (X[:, 2] > 0.5) & (X[:, 2] < 60)
    cap = k0.xy.shape[0]
    map_pts = jnp.zeros((cap, 3)).at[q].set(jnp.where(good[:, None], X, 0.0))
    mp_valid = jnp.zeros(cap, bool).at[q].max(good)
    assert int(mp_valid.sum()) > 30
    return k0, d0, map_pts, mp_valid


def test_full_loop_detection_with_geometry(
    loop_closure, kitti_features, kitti_keyframe0, loop_features
):
    """detect() end-to-end: BoW retrieval picks the KITTI keyframe over the
    indoor distractors, and RANSAC DLT-PnP verifies with real 3D points."""
    k0, d0, map_pts, mp_valid = kitti_keyframe0
    db = loop_closure.new_db(max_keypoints=1024)
    db = loop_closure.add_keyframe(db, 0, d0, k0.xy, k0.valid, map_pts, mp_valid)
    # distractor keyframes (indoor sequence), ids far from 0
    for j, i in enumerate((3, 4, 5, 6)):
        kps, desc = loop_features[i]
        db = loop_closure.add_keyframe(
            db, 20 + j, desc, kps.xy, kps.valid,
            backprojected_points(kps, LOOP_K, seed=i),
        )
    # query: KITTI frame 1 — interpolates the 0→2 triangulation pair
    _, (kps1, desc1), _ = kitti_features
    res = loop_closure.detect(
        db, desc1, kps1.xy, kps1.valid, jnp.asarray(KITTI_K, jnp.float32),
        jax.random.PRNGKey(7),
    )
    assert bool(res.success), (
        f"candidate={int(res.candidate_id)} score={float(res.bow_score):.3f} "
        f"inliers={int(res.num_inliers)}"
    )
    assert int(res.matched_keyframe_id) == 0
    assert int(res.num_inliers) >= loop_closure.config.min_inliers_for_pnp
    T = np.asarray(res.relative_transform)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # KITTI forward motion: frame 1 sits halfway along the 0→2 baseline
    assert -0.8 < T[2, 3] < -0.2, T[:3, 3]


def test_loop_rejected_when_geometry_inconsistent(
    loop_closure, kitti_features, kitti_keyframe0
):
    """Same BoW candidate but scrambled map points → verification must fail
    (the reference's FAILED branch, loop_closure.cpp:234-235)."""
    k0, d0, map_pts, mp_valid = kitti_keyframe0
    rng = np.random.default_rng(3)
    scrambled = jnp.asarray(
        rng.permutation(np.asarray(map_pts)), jnp.float32
    )
    db = loop_closure.new_db(max_keypoints=1024)
    db = loop_closure.add_keyframe(db, 0, d0, k0.xy, k0.valid, scrambled, mp_valid)
    kps2b, desc2b = kitti_features[2]
    db = loop_closure.add_keyframe(
        db, 10, desc2b, kps2b.xy, kps2b.valid,
        jnp.zeros_like(scrambled), jnp.zeros_like(mp_valid),
    )
    _, (kps1, desc1), _ = kitti_features
    res = loop_closure.detect(
        db, desc1, kps1.xy, kps1.valid, jnp.asarray(KITTI_K, jnp.float32)
    )
    assert not bool(res.success)
    assert int(res.matched_keyframe_id) == -1


# --- DB mechanics ----------------------------------------------------------------


def test_ring_buffer_overflow(loop_closure, loop_features):
    cfg = loop_closure.config
    db = loop_closure.new_db(max_keypoints=1024)
    kps, desc = loop_features[0]
    mp = backprojected_points(kps, LOOP_K)
    for i in range(cfg.max_keyframes + 3):
        db = loop_closure.add_keyframe(db, i, desc, kps.xy, kps.valid, mp)
    assert int(db.count) == cfg.max_keyframes + 3
    ids = np.asarray(db.ids)
    assert ids.min() >= 3


def test_vocabulary_roundtrip(tmp_path, vocabulary):
    p = tmp_path / "vocab.npz"
    vocabulary.save(p)
    v2 = Vocabulary.load(p)
    np.testing.assert_array_equal(
        np.asarray(v2.centroids), np.asarray(vocabulary.centroids)
    )
    np.testing.assert_allclose(np.asarray(v2.idf), np.asarray(vocabulary.idf))


def test_vocabulary_missing_file():
    with pytest.raises(FileNotFoundError, match="Vocabulary not found"):
        Vocabulary.load("/nonexistent/vocab.npz")


def test_transform_empty_descriptors(vocabulary):
    desc = jnp.zeros((32, 32), jnp.uint8)
    bow = vocabulary.transform(desc, jnp.zeros(32, bool))
    assert float(jnp.sum(bow)) == 0.0


def test_self_similarity_highest(vocabulary, loop_features):
    bows = [vocabulary.transform(d, k.valid) for k, d in loop_features]
    S = np.asarray(jnp.stack(bows) @ jnp.stack(bows).T)
    assert np.allclose(np.diag(S), 1.0, atol=1e-5)
    # frame 9 revisits frame 0: their score must be 9's best among 0..8
    assert S[9, :9].argmax() == 0


# --- second-best gate: grouped (ours) vs literal (reference) -------------------


def _gate_db(lc, scores_by_id, last_id):
    """A DB whose BoW rows produce the given query scores by construction."""
    db = lc.new_db(max_keypoints=8)
    bow = np.zeros((db.capacity, lc.vocabulary.num_words), np.float32)
    ids = np.full(db.capacity, -1, np.int32)
    for slot, (kid, score) in enumerate(scores_by_id.items()):
        bow[slot, 0] = score  # query = e0, so score = dot product
        ids[slot] = kid
    return db._replace(
        bow=jnp.asarray(bow),
        ids=jnp.asarray(ids),
        count=jnp.asarray(len(scores_by_id), jnp.int32),
        last_id=jnp.asarray(last_id, jnp.int32),
    )


def _gate_outcome(lc, scores_by_id, last_id=8):
    q = jnp.zeros(lc.vocabulary.num_words, jnp.float32).at[0].set(1.0)
    db = _gate_db(lc, scores_by_id, last_id)
    _, cand_id, candidate_ok, _ = lc._gates_impl(db, q)
    return bool(candidate_ok), int(cand_id)


def test_second_best_gate_grouped_vs_literal(vocabulary):
    """The reference's literal runner-up gate (loop_closure.cpp:137-141)
    rejects a true loop whose *temporal neighbour* also scores high — the
    normal situation on any self-similar revisit; the grouped gate (our
    documented deviation, SecondBestGrouped: 1) accepts it.  Both gates
    must still reject a match that is ambiguous across distinct places."""
    mcfg = MatcherConfig(ratio_test_threshold=0.8)

    def make(grouped):
        return LoopClosure(
            vocabulary,
            LoopClosureConfig(
                min_db_size=2,
                min_frames_difference=2,
                min_absolute_score=0.005,
                relative_score_factor=1.1,
                second_best_grouped=grouped,
            ),
            mcfg,
        )

    lc_grouped, lc_literal = make(True), make(False)

    # True loop at id 0 (0.9); its temporal neighbour id 1 scores 0.85;
    # distinct places (ids 4..6) score low.
    revisit = {0: 0.9, 1: 0.85, 4: 0.1, 5: 0.1, 6: 0.1}
    ok_g, cand_g = _gate_outcome(lc_grouped, revisit)
    ok_l, _ = _gate_outcome(lc_literal, revisit)
    assert ok_g and cand_g == 0  # grouped: neighbour doesn't veto the loop
    assert not ok_l  # literal: 0.9 < 1.1 * 0.85 → rejected

    # Ambiguity across DISTINCT places (id 5 is far from id 0): both gates
    # must reject — this is the scenario the gate exists for.
    ambiguous = {0: 0.9, 4: 0.1, 5: 0.85, 6: 0.1}
    assert not _gate_outcome(lc_grouped, ambiguous)[0]
    assert not _gate_outcome(lc_literal, ambiguous)[0]

    # Unambiguous match: both gates accept.
    clean = {0: 0.9, 4: 0.1, 5: 0.1, 6: 0.1}
    assert _gate_outcome(lc_grouped, clean)[0]
    assert _gate_outcome(lc_literal, clean)[0]


# --- chunked path == sequential path -------------------------------------------


@pytest.mark.parametrize("disable", [(), (3, 7)])
def test_process_chunk_matches_sequential(loop_closure, loop_features, disable):
    """The batched whole-chunk path (batched gates + one ring-window blit
    insert) must reproduce the sequential detect→add semantics frame by
    frame — including *intra-chunk* candidates: in the 10-frame revisit
    fixture processed as ONE chunk, frame 9's true match (frame 0) is a
    keyframe inserted earlier in the same chunk, and disabled frames must
    be invisible to detection and leave the database untouched."""
    lc = loop_closure
    Kj = jnp.asarray(LOOP_K, jnp.float32)
    B = len(loop_features)
    enabled = np.array([i not in disable for i in range(B)])
    mps = [backprojected_points(f[0], LOOP_K, seed=i)
           for i, f in enumerate(loop_features)]
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    # Sequential oracle: single-frame detect-then-add over enabled frames.
    db_seq = lc.new_db(loop_features[0][0].xy.shape[0])
    seq = []
    for i, (kps, desc) in enumerate(loop_features):
        if enabled[i]:
            res = lc.detect(db_seq, desc, kps.xy, kps.valid, Kj, key=keys[i])
            db_seq = lc.add_keyframe(
                db_seq, i, desc, kps.xy, kps.valid, mps[i], kps.valid
            )
        else:
            res = None
        seq.append(res)

    # Chunked path: the whole sequence as one batch.
    db_chunk = lc.new_db(loop_features[0][0].xy.shape[0])
    desc_b = jnp.stack([d for _, d in loop_features])
    xy_b = jnp.stack([k.xy for k, _ in loop_features])
    kv_b = jnp.stack([k.valid for k, _ in loop_features])
    mp_b = jnp.stack(mps)
    db_chunk, results = lc.process_chunk(
        db_chunk,
        jnp.arange(B, dtype=jnp.int32),
        jnp.asarray(enabled),
        desc_b, xy_b, kv_b, mp_b, kv_b, Kj, keys,
    )

    for i, res in enumerate(seq):
        if res is None:
            assert not bool(results.success[i])
            assert int(results.candidate_id[i]) == -1
            continue
        assert int(results.candidate_id[i]) == int(res.candidate_id), i
        assert bool(results.success[i]) == bool(res.success), i
        assert int(results.matched_keyframe_id[i]) == int(
            res.matched_keyframe_id
        ), i
        np.testing.assert_allclose(
            float(results.bow_score[i]), float(res.bow_score), atol=1e-6
        )
        if bool(res.success):
            assert int(results.num_inliers[i]) == int(res.num_inliers), i
            np.testing.assert_allclose(
                np.asarray(results.relative_transform[i]),
                np.asarray(res.relative_transform),
                atol=1e-5,
            )

    # The databases must be identical.
    assert int(db_chunk.count) == int(db_seq.count)
    assert int(db_chunk.last_id) == int(db_seq.last_id)
    np.testing.assert_array_equal(np.asarray(db_chunk.ids), np.asarray(db_seq.ids))
    np.testing.assert_allclose(
        np.asarray(db_chunk.bow), np.asarray(db_seq.bow), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(db_chunk.descriptors), np.asarray(db_seq.descriptors)
    )
    np.testing.assert_array_equal(
        np.asarray(db_chunk.kp_valid), np.asarray(db_seq.kp_valid)
    )


def test_process_chunk_ring_wrap(loop_closure, loop_features):
    """A chunk that wraps the ring buffer must land rows at the right
    slots (count % capacity onward) and keep ids/count consistent."""
    lc = loop_closure
    Kj = jnp.asarray(LOOP_K, jnp.float32)
    B = len(loop_features)
    kp_cap = loop_features[0][0].xy.shape[0]
    from tpuslam.backend.loop_closure import empty_db

    cap = 16
    db = empty_db(cap, lc.vocabulary.num_words, kp_cap, 32)
    # Pretend 12 keyframes came before: the 10-frame chunk wraps the ring.
    db = db._replace(
        count=jnp.asarray(12, jnp.int32),
        last_id=jnp.asarray(11, jnp.int32),
        ids=db.ids.at[:12].set(jnp.arange(12, dtype=jnp.int32)),
    )
    desc_b = jnp.stack([d for _, d in loop_features])
    xy_b = jnp.stack([k.xy for k, _ in loop_features])
    kv_b = jnp.stack([k.valid for k, _ in loop_features])
    mp_b = jnp.stack(
        [backprojected_points(f[0], LOOP_K, seed=i)
         for i, f in enumerate(loop_features)]
    )
    fids = jnp.arange(100, 100 + B, dtype=jnp.int32)
    db2, _ = lc.process_chunk(
        db, fids, jnp.ones(B, bool), desc_b, xy_b, kv_b, mp_b, kv_b, Kj,
        jax.random.split(jax.random.PRNGKey(0), B),
    )
    assert int(db2.count) == 22
    assert int(db2.last_id) == 100 + B - 1
    ids = np.asarray(db2.ids)
    # slots 12..15 take frames 100..103, wrap: slots 0..5 take 104..109
    np.testing.assert_array_equal(ids[12:16], [100, 101, 102, 103])
    np.testing.assert_array_equal(ids[:6], [104, 105, 106, 107, 108, 109])
    np.testing.assert_array_equal(ids[6:12], np.arange(6, 12))


def test_verify_budget_compaction(vocabulary, loop_closure, loop_features):
    """With verify_budget V, the first V candidate frames of a chunk must
    verify exactly as the unbudgeted path; over-budget candidates keep
    their candidate_id/bow_score but report success=False."""
    from dataclasses import replace

    Kj = jnp.asarray(LOOP_K, jnp.float32)
    B = len(loop_features)
    mps = [backprojected_points(f[0], LOOP_K, seed=i)
           for i, f in enumerate(loop_features)]
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    desc_b = jnp.stack([d for _, d in loop_features])
    xy_b = jnp.stack([k.xy for k, _ in loop_features])
    kv_b = jnp.stack([k.valid for k, _ in loop_features])
    mp_b = jnp.stack(mps)
    args = (jnp.arange(B, dtype=jnp.int32), jnp.ones(B, bool),
            desc_b, xy_b, kv_b, mp_b, kv_b, Kj, keys)

    def run(budget):
        lc = LoopClosure(
            vocabulary,
            replace(loop_closure.config, verify_budget=budget),
            loop_closure.matcher_config,
        )
        db = lc.new_db(desc_b.shape[1])
        return lc.process_chunk(db, *args)

    _, full = run(0)
    n_cand = int(np.sum(np.asarray(full.candidate_id) >= 0))
    assert n_cand >= 2, "fixture must produce multiple candidates"
    cand_order = np.flatnonzero(np.asarray(full.candidate_id) >= 0)

    # Budget covering all candidates: identical results.
    db_a, res_a = run(n_cand)
    for field in ("candidate_id", "success", "matched_keyframe_id",
                  "num_inliers"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_a, field)), np.asarray(getattr(full, field))
        )
    np.testing.assert_allclose(
        np.asarray(res_a.relative_transform),
        np.asarray(full.relative_transform), atol=1e-6,
    )

    # Budget of 1: only the first candidate frame verifies; the rest are
    # dropped (success=False, identity transform) but keep the gate output.
    _, res_b = run(1)
    first = cand_order[0]
    assert bool(res_b.success[first]) == bool(full.success[first])
    np.testing.assert_array_equal(
        np.asarray(res_b.candidate_id), np.asarray(full.candidate_id)
    )
    np.testing.assert_allclose(
        np.asarray(res_b.bow_score), np.asarray(full.bow_score), atol=1e-6
    )
    for i in cand_order[1:]:
        assert not bool(res_b.success[i])
        np.testing.assert_array_equal(
            np.asarray(res_b.relative_transform[i]), np.eye(4, dtype=np.float32)
        )
    # The database insert is budget-independent.
    db_f, _ = run(0)
    np.testing.assert_array_equal(np.asarray(db_a.ids), np.asarray(db_f.ids))
    np.testing.assert_allclose(
        np.asarray(db_a.bow), np.asarray(db_f.bow), atol=1e-6
    )


def test_relocalize_chunk_recovers_stored_pose(loop_closure, loop_features):
    """A lost frame that revisits a stored view must relocalize to (close
    to) that keyframe's stored absolute pose; frames that don't need
    relocalization must report ok=False."""
    lc = loop_closure
    Kj = jnp.asarray(LOOP_K, jnp.float32)
    B = len(loop_features)
    mps = [backprojected_points(f[0], LOOP_K, seed=i)
           for i, f in enumerate(loop_features)]

    # Distinct synthetic absolute poses per keyframe (translations only —
    # the stored map points live in each keyframe's camera frame, so any
    # rigid pose is consistent).
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    poses[:, :3, 3] = np.arange(B)[:, None] * np.array([1.0, 0.25, 2.0])

    db = lc.new_db(loop_features[0][0].xy.shape[0])
    for i in range(B):
        kps, desc = loop_features[i]
        db = lc.add_keyframe(
            db, i, desc, kps.xy, kps.valid, mps[i], kps.valid,
            pose=jnp.asarray(poses[i]),
        )

    # Query chunk: frame 0's own features again (an exact revisit) at
    # position 0, plus the other frames with need=False.
    desc_b = jnp.stack([d for _, d in loop_features])
    xy_b = jnp.stack([k.xy for k, _ in loop_features])
    kv_b = jnp.stack([k.valid for k, _ in loop_features])
    need = jnp.zeros(B, bool).at[0].set(True)
    ok, T, ni, matched = lc.relocalize_chunk(
        db, need, desc_b, xy_b, kv_b, Kj,
        jax.random.split(jax.random.PRNGKey(3), B), budget=2,
    )
    assert bool(ok[0]), "exact revisit must relocalize"
    assert int(matched[0]) == 0
    assert int(ni[0]) >= lc.config.min_inliers_for_pnp
    # Identical view ⇒ PnP relative ≈ identity ⇒ recovered pose ≈ stored.
    np.testing.assert_allclose(
        np.asarray(T[0]), poses[0], atol=0.05
    )
    # Un-needy frames are untouched.
    assert not bool(ok[1:].any())
    np.testing.assert_array_equal(np.asarray(matched[1:]), -1)
    np.testing.assert_allclose(
        np.asarray(T[1:]), np.tile(np.eye(4), (B - 1, 1, 1)), atol=1e-6
    )


def test_relocalize_respects_budget_and_empty_db(loop_closure, loop_features):
    lc = loop_closure
    Kj = jnp.asarray(LOOP_K, jnp.float32)
    B = len(loop_features)
    desc_b = jnp.stack([d for _, d in loop_features])
    xy_b = jnp.stack([k.xy for k, _ in loop_features])
    kv_b = jnp.stack([k.valid for k, _ in loop_features])
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    # Empty DB: nothing to relocalize against.
    db0 = lc.new_db(desc_b.shape[1])
    ok, _, _, matched = lc.relocalize_chunk(
        db0, jnp.ones(B, bool), desc_b, xy_b, kv_b, Kj, keys
    )
    assert not bool(ok.any())
    np.testing.assert_array_equal(np.asarray(matched), -1)

    # Budget 1 with two needy revisits: only the first one verifies.
    mps = [backprojected_points(f[0], LOOP_K, seed=i)
           for i, f in enumerate(loop_features)]
    db = lc.new_db(desc_b.shape[1])
    for i in range(B):
        kps, desc = loop_features[i]
        db = lc.add_keyframe(db, i, desc, kps.xy, kps.valid, mps[i], kps.valid)
    need = jnp.zeros(B, bool).at[2].set(True).at[5].set(True)
    ok, _, _, _ = lc.relocalize_chunk(
        db, need, desc_b, xy_b, kv_b, Kj, keys, budget=1
    )
    # budget 1: exactly ONE of the two needy exact revisits verifies (the
    # higher-BoW-scoring one wins the slot — selection is score-priority)
    assert bool(ok[2]) != bool(ok[5]), np.asarray(ok)
    assert int(ok.sum()) == 1
