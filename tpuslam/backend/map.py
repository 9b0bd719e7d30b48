"""Fixed-shape world map: keyframe poses + 3D points + observations.

The reference declares (but never implements) a mutex-guarded ``Map`` with
``insertKeyframe`` / ``insertMapPoint`` (``include/slam/backend/map.hpp:9-21``
— header-only skeleton, no .cpp).  The TPU-native equivalent is an immutable
pytree of capacity-bounded buffers updated functionally: no mutex, no shared
mutable state — the "thread safety" of the reference design is obsolete by
construction (SURVEY §5).

Observations are stored as a dense (W keyframes × P points) grid with a
mask — the layout bundle adjustment consumes directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapState(NamedTuple):
    """World state (pytree).  W = keyframe window capacity, P = point capacity."""

    kf_R: jax.Array  # (W, 3, 3) — world→camera rotation (x_c = R X + t)
    kf_t: jax.Array  # (W, 3)
    kf_id: jax.Array  # (W,) int32 — frame id (-1 = empty)
    kf_valid: jax.Array  # (W,) bool
    points: jax.Array  # (P, 3) — world coordinates
    point_valid: jax.Array  # (P,) bool
    obs_uv: jax.Array  # (W, P, 2) — pixel observation of point j in keyframe i
    obs_mask: jax.Array  # (W, P) bool
    kf_count: jax.Array  # () int32 — total keyframes ever inserted
    point_count: jax.Array  # () int32 — total points ever inserted

    @property
    def window(self) -> int:
        return self.kf_R.shape[0]

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


def empty_map(window: int = 8, max_points: int = 4096) -> MapState:
    return MapState(
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (window, 3, 3)),
        kf_t=jnp.zeros((window, 3), jnp.float32),
        kf_id=jnp.full((window,), -1, jnp.int32),
        kf_valid=jnp.zeros((window,), bool),
        points=jnp.zeros((max_points, 3), jnp.float32),
        point_valid=jnp.zeros((max_points,), bool),
        obs_uv=jnp.zeros((window, max_points, 2), jnp.float32),
        obs_mask=jnp.zeros((window, max_points), bool),
        kf_count=jnp.asarray(0, jnp.int32),
        point_count=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def insert_keyframe(
    m: MapState, frame_id: jax.Array, R: jax.Array, t: jax.Array
) -> tuple[MapState, jax.Array]:
    """Insert a keyframe pose into the sliding window (ring slot).

    Returns (new map, slot index).  The analog of ``Map::insertKeyframe``
    (``map.hpp:12``); on overflow the oldest slot is recycled and its
    observations cleared.
    """
    slot = m.kf_count % m.window
    return (
        m._replace(
            kf_R=m.kf_R.at[slot].set(R),
            kf_t=m.kf_t.at[slot].set(t),
            kf_id=m.kf_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
            kf_valid=m.kf_valid.at[slot].set(True),
            obs_uv=m.obs_uv.at[slot].set(0.0),
            obs_mask=m.obs_mask.at[slot].set(False),
            kf_count=m.kf_count + 1,
        ),
        slot,
    )


@jax.jit
def insert_points(
    m: MapState, new_points: jax.Array, new_valid: jax.Array
) -> tuple[MapState, jax.Array]:
    """Append up to N new 3D points (ring allocation).

    ``new_points``: (N, 3); ``new_valid``: (N,) — invalid entries are not
    written.  Returns (new map, (N,) slot indices).  The analog of
    ``Map::insertMapPoint`` (``map.hpp:16``) batched.
    """
    n = new_points.shape[0]
    # Sequential slots for valid entries, allocated from point_count.
    offsets = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    slots = (m.point_count + offsets) % m.capacity
    write_slots = jnp.where(new_valid, slots, m.capacity)  # OOB → dropped
    points = m.points.at[write_slots].set(new_points, mode="drop")
    point_valid = m.point_valid.at[write_slots].set(True, mode="drop")
    # Recycled slots lose their old observations.
    obs_mask = m.obs_mask.at[:, write_slots].set(False, mode="drop")
    n_new = jnp.sum(new_valid.astype(jnp.int32))
    return (
        m._replace(
            points=points,
            point_valid=point_valid,
            obs_mask=obs_mask,
            point_count=m.point_count + n_new,
        ),
        jnp.where(new_valid, slots, -1),
    )


@jax.jit
def add_observations(
    m: MapState,
    kf_slot: jax.Array,
    point_slots: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
) -> MapState:
    """Record pixel observations of ``point_slots`` in keyframe ``kf_slot``."""
    ps = jnp.where(valid & (point_slots >= 0), point_slots, m.capacity)
    return m._replace(
        obs_uv=m.obs_uv.at[kf_slot, ps].set(uv, mode="drop"),
        obs_mask=m.obs_mask.at[kf_slot, ps].set(True, mode="drop"),
    )
