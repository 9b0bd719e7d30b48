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
