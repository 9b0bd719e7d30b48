"""Checkpoint / resume tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.loop_closure import empty_db
from tpuslam.backend.map import empty_map, insert_keyframe, insert_points
from tpuslam.utils.checkpoint import load_state, save_state


def test_roundtrip_map_state(tmp_path):
    m = empty_map(window=4, max_points=64)
    m, _ = insert_keyframe(m, 3, jnp.eye(3) * 2.0, jnp.asarray([1.0, 2, 3]))
    m, _ = insert_points(m, jnp.ones((5, 3)), jnp.ones(5, bool))
    p = tmp_path / "ckpt.npz"
    save_state(p, map=m)
    back = load_state(p, map=empty_map(window=4, max_points=64))["map"]
    for a, b in zip(back, m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_multiple_states(tmp_path):
    m = empty_map(window=2, max_points=8)
    db = empty_db(capacity=4, num_words=16, max_keypoints=8, desc_bytes=32)
    traj = np.random.default_rng(0).normal(size=(7, 4, 4))
    p = tmp_path / "ckpt.npz"
    save_state(p, map=m, db=db, trajectory=traj)
    out = load_state(
        p,
        map=empty_map(window=2, max_points=8),
        db=empty_db(capacity=4, num_words=16, max_keypoints=8, desc_bytes=32),
        trajectory=np.zeros((7, 4, 4)),
    )
    np.testing.assert_allclose(np.asarray(out["trajectory"]), traj)
    assert out["db"].bow.shape == (4, 16)


def test_missing_checkpoint():
    with pytest.raises(FileNotFoundError):
        load_state("/nonexistent/ckpt.npz", map=empty_map(2, 8))


def test_missing_name(tmp_path):
    p = tmp_path / "ckpt.npz"
    save_state(p, map=empty_map(2, 8))
    with pytest.raises(KeyError, match="no state named 'db'"):
        load_state(p, db=empty_db(2, 4, 4, 32))


def test_wrong_template(tmp_path):
    p = tmp_path / "ckpt.npz"
    save_state(p, map=empty_map(2, 8))
    with pytest.raises(ValueError, match="leaves"):
        load_state(p, map=(jnp.zeros(3), jnp.zeros(3)))
