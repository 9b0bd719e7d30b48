"""update_map_chunk_batched must reproduce the per-frame scan oracle exactly.

The batched fold (``tpuslam.backend.map.update_map_chunk_batched``) replaces
the sequential per-frame map updates with a lean identity scan plus one
batched rebuild of the surviving keyframe-window rows.  These tests chain
multiple chunks of a synthetic scene through BOTH implementations and demand
field-for-field equality of the resulting ``MapState``/``AssocState`` —
covering landmark re-association, reprojection-gate breaks (association
respawns a new landmark), pose failures, sparse keyframe masks, chunks with
no keyframes at all, and point-ring recycling across chunks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.map import (
    empty_assoc,
    empty_map,
    update_map_chunk,
    update_map_chunk_batched,
)
from tpuslam.common.geometry import so3_exp

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def _make_chunks(
    rng,
    n_chunks=4,
    B=6,
    n_land=40,
    Kp=48,
    bad_match_frac=0.15,
    pose_fail=(),
    kf_every=1,
):
    """Synthetic chunk inputs with real cross-frame match chains.

    Each frame observes every landmark at a per-frame random keypoint slot;
    matches link the previous frame's slot of a landmark to the current
    frame's.  A fraction of matches is corrupted to a WRONG query slot so
    the reprojection gate fires and the association chain breaks (the
    respawn path).  Landmark count and chunk count are sized so the point
    ring recycles across chunks.
    """
    X = rng.uniform([-6, -4, 8], [6, 4, 24], size=(n_land, 3)).astype(np.float32)
    n_frames = n_chunks * B
    perms = np.stack([rng.permutation(Kp)[:n_land] for _ in range(n_frames)])
    chunks = []
    C_prev = None
    for c in range(n_chunks):
        fids = np.arange(c * B, (c + 1) * B, dtype=np.int32)
        poses = np.zeros((B, 4, 4), np.float32)
        kps_xy = np.zeros((B, Kp, 2), np.float32)
        m_query = np.full((B, n_land), -1, np.int32)
        m_train = np.full((B, n_land), -1, np.int32)
        m_valid = np.zeros((B, n_land), bool)
        pts3 = np.zeros((B, n_land, 3), np.float32)
        pok = np.zeros((B, n_land), bool)
        for i in range(B):
            f = c * B + i
            Rw = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 0.01)))
            C = np.array([0.2 * f, 0.05 * np.sin(f), 0.1 * f], np.float32)
            poses[i] = np.eye(4)
            poses[i][:3, :3] = Rw
            poses[i][:3, 3] = C
            cam = (X - C) @ Rw  # x_c = Rᵀ(X − C)
            pix = cam @ K.T
            uv = pix[:, :2] / pix[:, 2:]
            kps_xy[i][perms[f]] = uv + rng.normal(size=uv.shape) * 0.3
            if f == 0:
                continue
            q = perms[f - 1].copy()
            bad = rng.random(n_land) < bad_match_frac
            # corrupt some queries: the chain inherits the wrong landmark
            # and the reprojection gate must kill it (respawn path)
            q[bad] = perms[f - 1][rng.integers(0, n_land, int(bad.sum()))]
            m_query[i] = q
            m_train[i] = perms[f]
            m_valid[i] = rng.random(n_land) < 0.9
            pts3[i] = cam + rng.normal(size=cam.shape).astype(np.float32) * 0.01
            pok[i] = rng.random(n_land) < 0.75
        kf_mask = (fids % kf_every == 0)
        pose_ok = np.array([f not in pose_fail for f in fids])
        chunks.append(
            dict(
                frame_ids=jnp.asarray(fids),
                kf_mask=jnp.asarray(kf_mask),
                poses=jnp.asarray(poses),
                pose_ok=jnp.asarray(pose_ok),
                kps_xy=jnp.asarray(kps_xy),
                m_query=jnp.asarray(m_query),
                m_train=jnp.asarray(m_train),
                m_valid=jnp.asarray(m_valid),
                points3d_cur=jnp.asarray(pts3),
                point_ok=jnp.asarray(pok),
            )
        )
        C_prev = C
    del C_prev
    return chunks


def _assert_states_equal(ms, mb, as_, ab, tag):
    for name in ms._fields:
        a, b = np.asarray(getattr(ms, name)), np.asarray(getattr(mb, name))
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5, err_msg=f"{tag}: MapState.{name}")
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{tag}: MapState.{name}")
    for name in as_._fields:
        a, b = np.asarray(getattr(as_, name)), np.asarray(getattr(ab, name))
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5, err_msg=f"{tag}: AssocState.{name}")
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{tag}: AssocState.{name}")


def _run_both(chunks, window, capacity, Kp, **kw):
    ms = mb = empty_map(window=window, max_points=capacity)
    as_ = ab = empty_assoc(Kp)
    Kf = jnp.asarray(K)
    for c, ch in enumerate(chunks):
        ms, as_ = update_map_chunk(ms, as_, Kf, **ch)
        mb, ab = update_map_chunk_batched(mb, ab, Kf, **ch, **kw)
        _assert_states_equal(ms, mb, as_, ab, f"chunk {c}")
    return ms, as_


def test_batched_equals_scan_basic():
    rng = np.random.default_rng(11)
    chunks = _make_chunks(rng, n_chunks=3, B=6, n_land=40, Kp=48)
    _run_both(chunks, window=4, capacity=512, Kp=48)


def test_batched_equals_scan_ring_recycling():
    """Capacity small enough that the point ring wraps across chunks, so
    stale associations must die by the closed-form birth/recycle check."""
    rng = np.random.default_rng(7)
    chunks = _make_chunks(rng, n_chunks=5, B=6, n_land=40, Kp=48)
    _run_both(chunks, window=3, capacity=160, Kp=48)


def test_batched_equals_scan_pose_failures_and_sparse_keyframes():
    rng = np.random.default_rng(3)
    chunks = _make_chunks(
        rng, n_chunks=4, B=6, n_land=32, Kp=40,
        pose_fail=(2, 3, 7, 13, 14, 15), kf_every=2,
    )
    _run_both(chunks, window=4, capacity=512, Kp=40)


def test_batched_equals_scan_dead_chunk():
    """A chunk in which no frame is a keyframe must be a map no-op in both
    implementations (association still propagates through it)."""
    rng = np.random.default_rng(5)
    chunks = _make_chunks(rng, n_chunks=3, B=4, n_land=24, Kp=32)
    dead = chunks[1]
    dead["kf_mask"] = jnp.zeros(4, bool)
    _run_both(chunks, window=4, capacity=256, Kp=32)


def test_batched_equals_scan_window_exceeds_chunk():
    """window > chunk length: pre-chunk rows survive and the carried
    previous-keyframe row takes frame 0's second-view observations."""
    rng = np.random.default_rng(13)
    chunks = _make_chunks(rng, n_chunks=5, B=3, n_land=24, Kp=32)
    _run_both(chunks, window=6, capacity=400, Kp=32)


def test_batched_rejects_degenerate_window():
    rng = np.random.default_rng(1)
    (ch,) = _make_chunks(rng, n_chunks=1, B=3, n_land=8, Kp=12)
    m = empty_map(window=1, max_points=64)
    a = empty_assoc(12)
    with pytest.raises(ValueError):
        update_map_chunk_batched(m, a, jnp.asarray(K), **ch)
