"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_device_mesh():
    from tpuslam.dist.mesh import make_device_mesh

    mesh = make_device_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("seq",)
    with pytest.raises(ValueError, match="Requested 16"):
        make_device_mesh(16)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must compile and execute."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_results_match_single_device():
    """Sequence-sharded execution must equal unsharded vmap execution."""
    import __graft_entry__ as g
    from tpuslam.dist.mesh import make_device_mesh, shard_batched_pipeline

    pipeline = g._tiny_pipeline()
    S, B = 8, 2
    h, w = pipeline.camera.height, pipeline.camera.width
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 256, (S, B, h, w)), jnp.uint8)
    valid = jnp.ones((S, B), bool)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (S, *a.shape)), pipeline.initial_state()
    )
    keys = jax.random.split(jax.random.PRNGKey(0), S)

    mesh = make_device_mesh(8)
    step = shard_batched_pipeline(pipeline, mesh)
    res_sharded, states_sharded = step(frames, valid, states, keys)

    res_local, states_local = jax.vmap(pipeline._process_chunk)(
        frames, valid, states, keys
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.poses), np.asarray(res_local.poses), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.pose_ok), np.asarray(res_local.pose_ok)
    )
    # state carries match too
    np.testing.assert_allclose(
        np.asarray(states_sharded.pose), np.asarray(states_local.pose), atol=1e-5
    )


def test_sharding_actually_distributes():
    """Outputs of the sharded step live on the mesh, sharded over 'seq'."""
    import __graft_entry__ as g
    from tpuslam.dist.mesh import make_device_mesh, shard_batched_pipeline

    pipeline = g._tiny_pipeline()
    S, B = 8, 2
    h, w = pipeline.camera.height, pipeline.camera.width
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.integers(0, 256, (S, B, h, w)), jnp.uint8)
    valid = jnp.ones((S, B), bool)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (S, *a.shape)), pipeline.initial_state()
    )
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    mesh = make_device_mesh(8)
    step = shard_batched_pipeline(pipeline, mesh)
    res, _ = step(frames, valid, states, keys)
    sharding = res.poses.sharding
    # the leading sequence axis must be split across all 8 devices
    assert len(sharding.device_set) == 8


def test_initialize_multihost_single_process_fallback():
    """Single-process environments must fall back gracefully (False) and
    leave the local mesh usable — the multi-host path itself needs a real
    pod, which the driver's dryrun covers structurally."""
    from tpuslam.dist.mesh import initialize_multihost, make_device_mesh

    assert initialize_multihost() is False
    mesh = make_device_mesh(4)
    assert mesh.devices.shape == (4,)


def _tiny_pnp_system(B=2):
    import __graft_entry__ as g
    from pathlib import Path

    from tpuslam.config.schema import DetectorConfig, PoseConfig, SlamConfig
    from tpuslam.model.system import SlamSystem

    cfg = SlamConfig(
        detector=DetectorConfig(max_keypoints=64),
        pose=PoseConfig(num_hypotheses=64),
        batch_size=B,
    )
    return SlamSystem(
        g._tiny_camera(),
        cfg,
        vocabulary=Path(__file__).resolve().parent.parent
        / "configs"
        / "vocabulary.npz",
        tracking="pnp",
        ba_window=4,
        ba_interval=2,
        ba_iterations=2,
        max_map_points=256,
    )


def test_shard_sequence_program_matches_unbatched():
    """shard_map full-SLAM sequence program == per-sequence unbatched runs.

    The multiseq formulation (bench --multiseq) runs one sequence per core
    via shard_map so the chunk program's lax.conds stay real branches; it
    must be numerically identical to running each sequence through the
    plain (unbatched) `_sequence_impl`.
    """
    from tpuslam.dist.mesh import make_device_mesh, shard_sequence_program

    system = _tiny_pnp_system()
    S, C, B = 8, 2, 2
    h, w = system.camera.height, system.camera.width
    rng = np.random.default_rng(3)
    chunks = jnp.asarray(rng.integers(0, 256, (S, C, B, h, w)), jnp.uint8)
    cvalid = jnp.ones((S, C, B), bool)
    db = system.loop_closure.new_db(
        system.config.detector.max_keypoints,
        system.config.detector.descriptor_bytes,
    )
    carry0 = (
        system.pipeline.initial_pnp_state(),
        db,
        jnp.asarray(0, jnp.int32),
    )
    carry_s = jax.tree.map(lambda a: jnp.broadcast_to(a, (S, *a.shape)), carry0)
    keys = jax.vmap(lambda k: jax.random.split(k, C))(
        jax.random.split(jax.random.PRNGKey(7), S)
    )

    mesh = make_device_mesh(S)
    step = shard_sequence_program(system._sequence_impl, mesh)
    carry_out, outs = step(chunks, cvalid, carry_s, keys)

    # sharded over the mesh
    assert len(outs["poses"].sharding.device_set) == S
    assert outs["poses"].shape == (S, C, B, 4, 4)

    for s in range(0, S, 3):  # spot-check sequences 0, 3, 6
        _, ref = system._sequence_jit(
            chunks[s], cvalid[s], carry0, keys[s]
        )
        np.testing.assert_allclose(
            np.asarray(outs["poses"][s]), np.asarray(ref["poses"]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(outs["pose_ok"][s]), np.asarray(ref["pose_ok"])
        )
