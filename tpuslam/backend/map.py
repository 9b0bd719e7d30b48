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

from functools import partial
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
    point_birth: jax.Array  # (P,) int32 — allocation counter at insertion
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
        point_birth=jnp.full((max_points,), -1, jnp.int32),
        obs_uv=jnp.zeros((window, max_points, 2), jnp.float32),
        obs_mask=jnp.zeros((window, max_points), bool),
        kf_count=jnp.asarray(0, jnp.int32),
        point_count=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def insert_keyframe(
    m: MapState,
    frame_id: jax.Array,
    R: jax.Array,
    t: jax.Array,
    enabled: jax.Array | bool = True,
) -> tuple[MapState, jax.Array]:
    """Insert a keyframe pose into the sliding window (ring slot).

    Returns (new map, slot index).  The analog of ``Map::insertKeyframe``
    (``map.hpp:12``); on overflow the oldest slot is recycled and its
    observations cleared.  With ``enabled=False`` the call is a masked
    no-op (slot −1) so it can live inside a ``scan`` over frames.
    """
    enabled = jnp.asarray(enabled)
    slot = m.kf_count % m.window
    ws = jnp.where(enabled, slot, m.window)  # OOB → dropped
    return (
        m._replace(
            kf_R=m.kf_R.at[ws].set(R, mode="drop"),
            kf_t=m.kf_t.at[ws].set(t, mode="drop"),
            kf_id=m.kf_id.at[ws].set(jnp.asarray(frame_id, jnp.int32), mode="drop"),
            kf_valid=m.kf_valid.at[ws].set(True, mode="drop"),
            obs_uv=m.obs_uv.at[ws].set(0.0, mode="drop"),
            obs_mask=m.obs_mask.at[ws].set(False, mode="drop"),
            kf_count=m.kf_count + enabled.astype(jnp.int32),
        ),
        jnp.where(enabled, slot, -1),
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
    point_birth = m.point_birth.at[write_slots].set(
        m.point_count + offsets, mode="drop"
    )
    # Recycled slots lose their old observations.
    obs_mask = m.obs_mask.at[:, write_slots].set(False, mode="drop")
    n_new = jnp.sum(new_valid.astype(jnp.int32))
    return (
        m._replace(
            points=points,
            point_valid=point_valid,
            point_birth=point_birth,
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


class AssocState(NamedTuple):
    """Cross-frame landmark association carried between chunks.

    Maps each keypoint slot of the *last processed frame* to the map-point
    slot it re-observes (−1 = none).  ``birth`` guards against ring-slot
    recycling: an association is honoured only while the slot still holds
    the same allocation (``MapState.point_birth`` matches).
    """

    kp_to_point: jax.Array  # (K,) int32 — map slot per keypoint, −1 none
    kp_birth: jax.Array  # (K,) int32 — allocation id guard
    prev_kf_slot: jax.Array  # () int32 — window slot of last keyframe, −1
    prev_xy: jax.Array  # (K, 2) float32 — last frame's keypoint pixels


def empty_assoc(max_keypoints: int) -> AssocState:
    return AssocState(
        kp_to_point=jnp.full((max_keypoints,), -1, jnp.int32),
        kp_birth=jnp.full((max_keypoints,), -1, jnp.int32),
        prev_kf_slot=jnp.asarray(-1, jnp.int32),
        prev_xy=jnp.zeros((max_keypoints, 2), jnp.float32),
    )


@partial(jax.jit, static_argnames=("gate_px",))
def update_map_chunk(
    m: MapState,
    assoc: AssocState,
    K: jax.Array,  # (3, 3) camera intrinsics (observation gating)
    frame_ids: jax.Array,  # (B,) int32
    kf_mask: jax.Array,  # (B,) bool — which frames become keyframes
    poses: jax.Array,  # (B, 4, 4) T_world_cam
    pose_ok: jax.Array,  # (B,) bool
    kps_xy: jax.Array,  # (B, K, 2)
    m_query: jax.Array,  # (B, M) int32 — match idx into previous frame kps
    m_train: jax.Array,  # (B, M) int32 — match idx into current frame kps
    m_valid: jax.Array,  # (B, M) bool
    points3d_cur: jax.Array,  # (B, M, 3) — current-camera-frame triangulations
    point_ok: jax.Array,  # (B, M) bool
    gate_px: float = 8.0,
) -> tuple[MapState, AssocState]:
    """Fold one chunk of frames into the map with landmark re-association.

    One jitted dispatch per chunk (replacing the round-1 per-keyframe host
    loop).  Landmark identity is propagated through *every* frame's match
    indices — a keypoint matched to a keypoint that carried a map point
    inherits that point — so keyframes separated by non-keyframe frames
    still re-observe the same landmarks, giving BA multi-view constraints
    (the round-1 map gave every point exactly one observation; VERDICT
    round 1, "What's weak" #2).  New triangulations also get a second
    observation in the previous keyframe when the pair's query frame was
    one.  Reference intent: ``Map::insertMapPoint`` persistent landmarks
    (``include/slam/backend/map.hpp:9-21``).
    """

    def step(carry, xs):
        m, a = carry
        fid, is_kf, T_w, ok_pose, xy, q, t, mv, X_cur, ok_pt = xs
        enabled = is_kf & (ok_pose | (m.kf_count == 0))

        qc = jnp.maximum(q, 0)
        tc = jnp.maximum(t, 0)
        uv_cur = xy[tc]
        # --- association through the previous frame's keypoints -------------
        cand_slot = a.kp_to_point[qc]  # (M,)
        cand_birth = a.kp_birth[qc]
        alive = (
            mv
            & (cand_slot >= 0)
            & (m.point_birth[jnp.maximum(cand_slot, 0)] == cand_birth)
            & m.point_valid[jnp.maximum(cand_slot, 0)]
        )
        # Reprojection gate: a chained association is only trusted if the
        # landmark actually projects near the keypoint that claims to
        # re-observe it (chains through one bad match otherwise smuggle
        # hundreds-of-pixels outliers into BA).
        R_cw_g = jnp.swapaxes(T_w[:3, :3], 0, 1)
        Xc_cand = (
            m.points[jnp.maximum(cand_slot, 0)] - T_w[:3, 3][None, :]
        ) @ R_cw_g.T
        z_cand = Xc_cand[:, 2]
        pix = Xc_cand @ K.T
        uv_pred = pix[:, :2] / jnp.maximum(pix[:, 2:3], 1e-9)
        gate = (z_cand > 0.2) & (
            jnp.sum((uv_pred - uv_cur) ** 2, axis=-1) < gate_px * gate_px
        )
        alive = alive & gate
        assoc_slot = jnp.where(alive, cand_slot, -1)

        # --- new landmarks: good triangulations with no association ---------
        R_w = T_w[:3, :3]
        X_world = (
            jnp.einsum("ij,mj->mi", R_w, X_cur, precision="highest")
            + T_w[:3, 3][None, :]
        )
        new_mask = ok_pt & (assoc_slot < 0) & enabled
        m2, new_slots = insert_points(m, X_world, new_mask)

        pt_slot = jnp.where(assoc_slot >= 0, assoc_slot, new_slots)  # (M,)

        # --- keyframe insertion + observations -------------------------------
        R_cw = jnp.swapaxes(R_w, 0, 1)
        m3, kf_slot = insert_keyframe(
            m2, fid, R_cw, -R_cw @ T_w[:3, 3], enabled
        )
        obs_ok = (alive | new_mask) & enabled
        m4 = add_observations(m3, jnp.maximum(kf_slot, 0), pt_slot, uv_cur, obs_ok)
        # second view for brand-new points: the pair's query frame, when it
        # was itself a keyframe still in the window (same reprojection gate)
        uv_prev = a.prev_xy[qc]
        pks = jnp.maximum(a.prev_kf_slot, 0)
        Xc_prev = X_world @ m4.kf_R[pks].T + m4.kf_t[pks][None, :]
        z_prev = Xc_prev[:, 2]
        pix_p = Xc_prev @ K.T
        uv_pred_p = pix_p[:, :2] / jnp.maximum(pix_p[:, 2:3], 1e-9)
        gate_p = (z_prev > 0.2) & (
            jnp.sum((uv_pred_p - uv_prev) ** 2, axis=-1) < gate_px * gate_px
        )
        m5 = add_observations(
            m4,
            pks,
            new_slots,
            uv_prev,
            new_mask & (a.prev_kf_slot >= 0) & gate_p,
        )

        # --- propagate landmark identity to the current frame ----------------
        k_cap = a.kp_to_point.shape[0]
        carry_ok = mv & (pt_slot >= 0) & (alive | (new_mask & enabled))
        tw = jnp.where(carry_ok, tc, k_cap)
        kp_to_point = (
            jnp.full((k_cap,), -1, jnp.int32).at[tw].set(pt_slot, mode="drop")
        )
        birth_of = m5.point_birth[jnp.maximum(pt_slot, 0)]
        kp_birth = (
            jnp.full((k_cap,), -1, jnp.int32).at[tw].set(birth_of, mode="drop")
        )
        a2 = AssocState(
            kp_to_point=kp_to_point,
            kp_birth=kp_birth,
            prev_kf_slot=jnp.where(enabled, kf_slot, jnp.asarray(-1, jnp.int32)),
            prev_xy=xy,
        )
        return (m5, a2), None

    (m_out, a_out), _ = jax.lax.scan(
        step,
        (m, assoc),
        (
            frame_ids,
            kf_mask,
            poses,
            pose_ok,
            kps_xy,
            m_query,
            m_train,
            m_valid,
            points3d_cur,
            point_ok,
        ),
    )
    return m_out, a_out
