"""Pose-graph optimisation tests: loop constraints remove drift."""

import jax.numpy as jnp
import numpy as np

from tpuslam.backend.pose_graph import (
    add_edge,
    graph_from_trajectory,
    optimize_pose_graph,
)
from tpuslam.common.geometry import so3_exp


def circle_trajectory(n=40, radius=10.0):
    """Ground-truth square-circle loop: camera moves on a circle, facing
    tangentially; pose i = T_world_cam."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        a = 2 * np.pi * i / n
        yaw = a + np.pi / 2
        R = np.asarray(so3_exp(jnp.asarray([0.0, yaw, 0.0])))
        poses[i, :3, :3] = R
        poses[i, :3, 3] = [radius * np.cos(a), 0.0, radius * np.sin(a)]
    return poses


def drifted_trajectory(gt, drift_per_step=0.02, rng=None):
    """Integrate relative GT motions with a small systematic error."""
    rng = rng or np.random.default_rng(0)
    n = len(gt)
    est = [gt[0]]
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        w = rng.normal(size=3) * drift_per_step * 0.5
        dR = np.asarray(so3_exp(jnp.asarray(w)))
        rel_d = rel.copy()
        rel_d[:3, :3] = dR @ rel[:3, :3]
        rel_d[:3, 3] = rel[:3, 3] * (1.0 + drift_per_step)
        est.append(est[-1] @ rel_d)
    return np.stack(est)


def test_chain_graph_noop_when_consistent():
    gt = circle_trajectory(20)
    g = graph_from_trajectory(jnp.asarray(gt, jnp.float32))
    out = optimize_pose_graph(g, iterations=3)
    np.testing.assert_allclose(np.asarray(out.nodes), gt, atol=1e-3)


def test_loop_closure_removes_drift():
    gt = circle_trajectory(40)
    est = drifted_trajectory(gt)
    # the loop end drifted away from its true pose
    drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_before > 0.5

    g = graph_from_trajectory(jnp.asarray(est, jnp.float32))
    # loop edge: node 39 ↔ node 0 with the TRUE relative transform
    T_rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[39], jnp.float32)
    g = add_edge(g, 39, 0, 39, T_rel, weight=20.0)
    out = optimize_pose_graph(g, iterations=15)

    opt = np.asarray(out.nodes)
    # gauge: node 0 untouched
    np.testing.assert_allclose(opt[0], est[0], atol=1e-5)
    # the loop-end error must shrink dramatically
    rel_after = np.linalg.inv(opt[0]) @ opt[39]
    err_after = np.linalg.norm(rel_after[:3, 3] - np.asarray(T_rel)[:3, 3])
    assert err_after < 0.05 * drift_before
    # mid-trajectory also improves vs ground truth
    mid_before = np.linalg.norm(est[20][:3, 3] - gt[20][:3, 3])
    mid_after = np.linalg.norm(opt[20][:3, 3] - gt[20][:3, 3])
    assert mid_after < mid_before
    # rotations stay orthonormal
    R = opt[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (40, 1, 1)), atol=1e-4)


def test_inactive_edges_ignored():
    gt = circle_trajectory(10)
    g = graph_from_trajectory(jnp.asarray(gt, jnp.float32))
    # a bogus inactive edge (weight 0) must not disturb anything
    bogus = jnp.eye(4).at[0, 3].set(99.0)
    g = add_edge(g, 9, 0, 5, bogus, weight=0.0)
    out = optimize_pose_graph(g, iterations=5)
    np.testing.assert_allclose(np.asarray(out.nodes), gt, atol=1e-3)


def test_pcg_matches_dense_solver():
    """The matrix-free PCG path must reproduce the dense solve (it exists
    because the dense (6N,6N) LU OOMed a chip at N~1500 in the round-4
    soak; small graphs stay exact-dense by default)."""
    gt = circle_trajectory(60)
    est = drifted_trajectory(gt)
    T_rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[59], jnp.float32)

    def solve(solver):
        g = graph_from_trajectory(jnp.asarray(est, jnp.float32))
        g = add_edge(g, 59, 0, 59, T_rel, weight=20.0)
        return np.asarray(
            optimize_pose_graph(g, iterations=15, solver=solver).nodes
        )

    dense = solve("dense")
    pcg = solve("pcg")
    # same optimum: endpoint positions agree to millimetres on a 10-unit
    # circle, all node positions to centimetres
    np.testing.assert_allclose(pcg[:, :3, 3], dense[:, :3, 3], atol=2e-2)
    rel_d = np.linalg.inv(dense[0]) @ dense[59]
    rel_p = np.linalg.inv(pcg[0]) @ pcg[59]
    np.testing.assert_allclose(rel_p, rel_d, atol=5e-3)


def test_pcg_scales_to_large_graphs():
    """N=1200 nodes + loop edge: the dense path would need a (7200,7200)
    LU; PCG must converge and close the loop."""
    gt = circle_trajectory(1200)
    est = drifted_trajectory(gt, drift_per_step=0.002)
    drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_before > 0.5
    g = graph_from_trajectory(jnp.asarray(est, jnp.float32))
    T_rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[1199], jnp.float32)
    g = add_edge(g, 1199, 0, 1199, T_rel, weight=20.0)
    out = optimize_pose_graph(g, iterations=10)  # auto-selects pcg
    opt = np.asarray(out.nodes)
    rel_after = np.linalg.inv(opt[0]) @ opt[1199]
    err_after = np.linalg.norm(rel_after[:3, 3] - np.asarray(T_rel)[:3, 3])
    assert err_after < 0.05 * drift_before
    assert np.isfinite(opt).all()
