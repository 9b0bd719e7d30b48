"""Device-mesh utilities: multi-sequence SLAM sharding.

The reference has no distributed execution of any kind (SURVEY §2: no
MPI/NCCL/threads in implemented code).  The TPU-native scaling model
(BASELINE config 5) is *sequence parallelism over a mesh*: S independent
video sequences are vmapped into one program and sharded across a
``jax.sharding.Mesh`` axis; per-sequence SLAM state is fully local so XLA
inserts no collectives on the hot path — cross-device traffic happens only
when results are gathered to the host.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join a multi-host JAX cluster (``jax.distributed.initialize``).

    The SURVEY §5 distributed-communication row: on multi-host TPU pods
    every host must call this before any mesh is built so
    ``jax.devices()`` spans the full pod and XLA collectives ride ICI/DCN.
    Arguments default to cluster-environment auto-detection (TPU pod
    metadata / coordinator env vars); explicit values support manual
    process launch.  Returns True when a multi-process runtime is active
    (idempotent; single-host callers get False and a local mesh).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Already initialized, or no cluster environment to detect —
        # single-process operation is the correct fallback for both.
        pass
    return jax.process_count() > 1


def make_device_mesh(n_devices: int | None = None, axis_name: str = "seq") -> Mesh:
    """Mesh over all (global, in multi-host runs) devices.

    After :func:`initialize_multihost`, ``jax.devices()`` returns every
    device in the cluster in a stable order, so the same call shapes a
    single-host v5e-8 mesh and a multi-host pod slice mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def sequence_sharding(mesh: Mesh, axis_name: str = "seq") -> NamedSharding:
    """Shard the leading (sequence) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def shard_vmapped_step(chunk_fn, mesh: Mesh, state_template: Any,
                       axis_name: str = "seq"):
    """Shard a per-sequence chunk function over the mesh's sequence axis.

    ``chunk_fn(frames (B, H, W), valid (B,), state, key)`` becomes
    ``step(frames (S, B, H, W), valid (S, B), states (S-stacked), keys
    (S, 2)) → (results, new states)`` with every argument and result
    sharded on its leading sequence axis.  Per-sequence state (including a
    persistent map in PnP mode) stays fully local to its device, so XLA
    inserts no collectives on the hot path.
    """
    seq_sharding = sequence_sharding(mesh, axis_name)

    def spec_like(tree: Any):
        return jax.tree.map(lambda _: seq_sharding, tree)

    vmapped = jax.vmap(chunk_fn)

    def step(frames, valid, states, keys):
        frames = jax.lax.with_sharding_constraint(frames, seq_sharding)
        return vmapped(frames, valid, states, keys)

    return jax.jit(
        step,
        in_shardings=(seq_sharding, seq_sharding, spec_like(state_template),
                      seq_sharding),
    )


def shard_batched_pipeline(pipeline, mesh: Mesh, axis_name: str = "seq"):
    """Jitted multi-sequence VO chunk step sharded over ``mesh``."""
    return shard_vmapped_step(
        pipeline._process_chunk, mesh, pipeline.initial_state(), axis_name
    )
