"""Pose-graph optimisation: fold loop-closure constraints into the trajectory.

The reference detects loops (``LoopClosure::detect`` returns a relative
transform, ``loop_closure.hpp:17-20``) but has no machinery to *use* them —
its ``Backend``/``SLAMModel`` were never implemented.  This module closes
that gap the TPU way: a Gauss–Newton pose-graph solver over SE(3) nodes with
fixed-capacity edge buffers, Jacobians from ``jax.jacfwd`` on the edge
residual, and one dense (6N, 6N) normal-equation solve per iteration —
dense linear algebra is cheap at SLAM-scale node counts and far friendlier
to the TPU than sparse factorization.

Residual per edge (i → j, measured relative transform T̂_ij, cam-to-world
nodes T_i): r = log(T̂_ij⁻¹ · T_i⁻¹ · T_j) ∈ se(3); gauge fixed at node 0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.common.geometry import so3_exp, so3_log


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph (pytree)."""

    nodes: jax.Array  # (N, 4, 4) — T_world_cam per node
    node_valid: jax.Array  # (N,) bool
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,) int32
    edge_T: jax.Array  # (E, 4, 4) — measured T_i⁻¹ T_j
    edge_weight: jax.Array  # (E,) float32 (0 = inactive)


def empty_graph(max_nodes: int, max_edges: int) -> PoseGraph:
    return PoseGraph(
        nodes=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (max_nodes, 4, 4)),
        node_valid=jnp.zeros((max_nodes,), bool),
        edge_i=jnp.zeros((max_edges,), jnp.int32),
        edge_j=jnp.zeros((max_edges,), jnp.int32),
        edge_T=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (max_edges, 4, 4)),
        edge_weight=jnp.zeros((max_edges,), jnp.float32),
    )


def _se3_log(T: jax.Array) -> jax.Array:
    """(…, 4, 4) → (…, 6) (ω, ν) — first-order (ν = translation) is enough
    for residuals near identity, which GN drives them to."""
    w = so3_log(T[..., :3, :3])
    return jnp.concatenate([w, T[..., :3, 3]], axis=-1)


def _apply_delta(T: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-multiplicative update: T ← exp(δ)·T."""
    dR = so3_exp(delta[..., :3])
    R = jnp.matmul(dR, T[..., :3, :3], precision="highest")
    t = (
        jnp.einsum("...ij,...j->...i", dR, T[..., :3, 3], precision="highest")
        + delta[..., 3:]
    )
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out.at[..., 3, 3].set(1.0)


def _edge_residual(delta_i, delta_j, Ti, Tj, T_meas_inv):
    Ti_new = _apply_delta(Ti, delta_i)
    Tj_new = _apply_delta(Tj, delta_j)
    # T_rel = Ti⁻¹ Tj  (both cam-to-world)
    Ri = Ti_new[:3, :3]
    rel_R = jnp.matmul(Ri.T, Tj_new[:3, :3], precision="highest")
    rel_t = Ri.T @ (Tj_new[:3, 3] - Ti_new[:3, 3])
    rel = jnp.eye(4, dtype=Ti.dtype)
    rel = rel.at[:3, :3].set(rel_R).at[:3, 3].set(rel_t)
    err = jnp.matmul(T_meas_inv, rel, precision="highest")
    return _se3_log(err)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    g: PoseGraph, *, iterations: int = 10, damping: float = 1e-6
) -> PoseGraph:
    """Gauss–Newton over all nodes; node 0 is the gauge anchor."""
    N = g.nodes.shape[0]
    T_meas_inv = jnp.linalg.inv(g.edge_T)

    jac = jax.jacfwd(_edge_residual, argnums=(0, 1))
    zero6 = jnp.zeros(6, jnp.float32)

    free = g.node_valid.astype(jnp.float32).at[0].set(0.0)  # (N,)

    def gn_step(nodes, _):
        Ti = nodes[g.edge_i]
        Tj = nodes[g.edge_j]

        def per_edge(Ti_e, Tj_e, Tm_e):
            Ji, Jj = jac(zero6, zero6, Ti_e, Tj_e, Tm_e)
            r = _edge_residual(zero6, zero6, Ti_e, Tj_e, Tm_e)
            return Ji, Jj, r

        Ji, Jj, r = jax.vmap(per_edge)(Ti, Tj, T_meas_inv)  # (E,6,6),(E,6,6),(E,6)
        w = g.edge_weight  # (E,)

        # Assemble H (N,6,N,6) and b (N,6) by scatter-add over edges.
        H = jnp.zeros((N, 6, N, 6), jnp.float32)
        b = jnp.zeros((N, 6), jnp.float32)

        def blocks(Ja, Jb):
            return jnp.einsum("eri,e,erj->eij", Ja, w, Jb, precision="highest")

        H = H.at[g.edge_i, :, g.edge_i, :].add(blocks(Ji, Ji))
        H = H.at[g.edge_j, :, g.edge_j, :].add(blocks(Jj, Jj))
        H = H.at[g.edge_i, :, g.edge_j, :].add(blocks(Ji, Jj))
        H = H.at[g.edge_j, :, g.edge_i, :].add(blocks(Jj, Ji))
        b = b.at[g.edge_i].add(-jnp.einsum("eri,e,er->ei", Ji, w, r, precision="highest"))
        b = b.at[g.edge_j].add(-jnp.einsum("eri,e,er->ei", Jj, w, r, precision="highest"))

        # Gauge + inactive nodes: zero their rows/cols, identity diagonal.
        H = H * free[:, None, None, None] * free[None, None, :, None]
        H = H.at[jnp.arange(N), :, jnp.arange(N), :].add(
            ((1.0 - free) + damping)[:, None, None] * jnp.eye(6)[None]
        )
        b = b * free[:, None]

        delta = jnp.linalg.solve(H.reshape(6 * N, 6 * N), b.reshape(-1)).reshape(N, 6)
        delta = delta * free[:, None]
        return jax.vmap(_apply_delta)(nodes, delta), None

    nodes, _ = jax.lax.scan(gn_step, g.nodes, None, length=iterations)
    return g._replace(nodes=nodes)


def add_edge(
    g: PoseGraph, slot: int | jax.Array, i, j, T_rel, weight: float = 1.0
) -> PoseGraph:
    return g._replace(
        edge_i=g.edge_i.at[slot].set(jnp.asarray(i, jnp.int32)),
        edge_j=g.edge_j.at[slot].set(jnp.asarray(j, jnp.int32)),
        edge_T=g.edge_T.at[slot].set(T_rel.astype(jnp.float32)),
        edge_weight=g.edge_weight.at[slot].set(weight),
    )


def graph_from_trajectory(
    poses: jax.Array, max_edges: int | None = None
) -> PoseGraph:
    """Build a chain graph from (N, 4, 4) cam-to-world poses."""
    N = poses.shape[0]
    E = max_edges if max_edges is not None else 4 * N
    g = empty_graph(N, E)
    g = g._replace(
        nodes=poses.astype(jnp.float32),
        node_valid=jnp.ones((N,), bool),
    )
    rel = jnp.einsum(
        "nij,njk->nik", jnp.linalg.inv(poses[:-1]), poses[1:], precision="highest"
    )
    idx = jnp.arange(N - 1)
    g = g._replace(
        edge_i=g.edge_i.at[: N - 1].set(idx.astype(jnp.int32)),
        edge_j=g.edge_j.at[: N - 1].set((idx + 1).astype(jnp.int32)),
        edge_T=g.edge_T.at[: N - 1].set(rel.astype(jnp.float32)),
        edge_weight=g.edge_weight.at[: N - 1].set(1.0),
    )
    return g
