"""SlamSystem: the complete SLAM stack — VO + keyframes + loop closure + BA.

This is the full composition the reference's ``SLAMModel`` declared but never
implemented (``model.hpp:20-27`` lists Camera → Preprocessor →
FeatureDetector → FeatureMatcher → PoseEstimator → Map → Backend →
Visualizer as commented-out members).  Concretely:

  * **tracking** — the batched VO pipeline (:mod:`tpuslam.model.slam`),
    which also triangulates per-pair map points on device;
  * **map** — the fixed-shape sliding window of
    :mod:`tpuslam.backend.map`, updated once per chunk
    (``update_map_chunk``): landmark identity is chained through every
    frame's match indices, so keyframes *re-observe* persistent landmarks
    and points accumulate multi-view observations — which is what makes
    windowed BA well-posed;
  * **backend** — sliding-window bundle adjustment
    (:mod:`tpuslam.backend.ba`) run every ``ba_interval`` keyframes, the
    functional equivalent of the reference's declared optimizer thread
    (``backend.hpp:13-17``): instead of a mutex-guarded shared map, the
    optimized window is folded back into the trajectory;
  * **loop closure** — BoW detection + PnP verification per keyframe
    (:mod:`tpuslam.backend.loop_closure`); detected loop constraints are
    folded back into the trajectory by pose-graph optimisation
    (:mod:`tpuslam.backend.pose_graph`) — capability the reference only
    gestured at (it computes LoopResult transforms and drops them).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.backend.ba import bundle_adjust
from tpuslam.backend.loop_closure import LoopClosure
from tpuslam.backend.map import empty_assoc, empty_map, update_map_chunk
from tpuslam.backend.vocabulary import Vocabulary
from tpuslam.common.camera import Camera
from tpuslam.config.schema import SlamConfig
from tpuslam.model.slam import SlamPipeline


@dataclass
class SlamSystem:
    camera: Camera
    config: SlamConfig
    vocabulary: Vocabulary | str | Path | None = None
    keyframe_interval: int = 1
    ba_window: int = 8
    ba_interval: int = 4
    ba_iterations: int = 8
    max_map_points: int = 8192
    enable_loop_closure: bool = True
    enable_ba: bool = True
    enable_pose_graph: bool = True

    def __post_init__(self) -> None:
        self.pipeline = SlamPipeline(self.camera, self.config)
        self._K = jnp.asarray(self.camera.K, jnp.float32)
        self.loop_closure = None
        if self.enable_loop_closure and self.vocabulary is not None:
            self.loop_closure = LoopClosure(
                self.vocabulary, self.config.loop_closure, self.config.matcher
            )

    def run(
        self,
        frame_batches: Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]],
        seed: int = 0,
    ) -> dict:
        state = self.pipeline.initial_state()
        key = jax.random.PRNGKey(seed)
        world_map = empty_map(self.ba_window, self.max_map_points)
        assoc = empty_assoc(self.config.detector.max_keypoints)
        db = (
            self.loop_closure.new_db(
                self.config.detector.max_keypoints,
                self.config.detector.descriptor_bytes,
            )
            if self.loop_closure is not None
            else None
        )

        poses: list[np.ndarray] = []
        loops: list[dict] = []
        ba_events: list[dict] = []
        stats = {"num_matches": [], "num_inliers": [], "pose_ok": []}
        frame_id = 0
        kf_since_ba = 0
        kf_fids: list[int] = []

        for frames, _stamps, valid in frame_batches:
            key, sub = jax.random.split(key)
            result, state = self.pipeline._chunk_full_fn(
                jnp.asarray(frames), jnp.asarray(valid), state, sub
            )
            n = int(valid.sum())
            chunk_poses = np.array(result.poses[:n])  # writable copy (BA folds poses back)
            poses.append(chunk_poses)
            stats["num_matches"].append(np.asarray(result.num_matches)[:n])
            stats["num_inliers"].append(np.asarray(result.num_inliers)[:n])
            stats["pose_ok"].append(np.asarray(result.pose_ok)[:n])

            # ---- map: keyframes + landmarks + associations, one dispatch ----
            B = result.poses.shape[0]
            fids_full = np.arange(frame_id, frame_id + B, dtype=np.int32)
            kf_mask = (fids_full % self.keyframe_interval == 0) & (
                np.arange(B) < n
            )
            world_map, assoc = update_map_chunk(
                world_map,
                assoc,
                self._K,
                jnp.asarray(fids_full),
                jnp.asarray(kf_mask),
                result.poses,
                result.pose_ok,
                result.kps_xy,
                result.m_query,
                result.m_train,
                result.m_valid,
                result.points3d,
                result.point_ok,
            )
            pose_ok_np = np.asarray(result.pose_ok)

            for b in range(n):
                fid = frame_id + b
                if not kf_mask[b]:
                    continue
                if not bool(pose_ok_np[b]) and fid > 0:
                    continue
                kf_fids.append(fid)
                kf_since_ba += 1

                # ---- loop closure -------------------------------------------
                if self.loop_closure is not None and db is not None:
                    key, sub2 = jax.random.split(key)
                    res = self.loop_closure.detect(
                        db,
                        result.desc[b],
                        result.kps_xy[b],
                        result.kps_valid[b],
                        self._K,
                        sub2,
                    )
                    if bool(res.success):
                        loops.append(
                            {
                                "frame_id": fid,
                                "matched_keyframe_id": int(res.matched_keyframe_id),
                                "num_inliers": int(res.num_inliers),
                                "relative_transform": np.asarray(
                                    res.relative_transform
                                ),
                            }
                        )
                    # map points for the DB live in the keyframe camera frame
                    ok = result.point_ok[b]
                    t_idx = jnp.maximum(result.m_train[b], 0)
                    mp_valid_kp = (
                        jnp.zeros(result.kps_valid.shape[1], bool)
                        .at[t_idx]
                        .max(ok)
                    )
                    mp_per_kp = (
                        jnp.zeros((result.kps_valid.shape[1], 3))
                        .at[t_idx]
                        .set(jnp.where(ok[:, None], result.points3d[b], 0.0))
                    )
                    db = self.loop_closure.add_keyframe(
                        db,
                        fid,
                        result.desc[b],
                        result.kps_xy[b],
                        result.kps_valid[b],
                        mp_per_kp,
                        mp_valid_kp,
                    )

                # ---- windowed bundle adjustment ------------------------------
                if self.enable_ba and kf_since_ba >= self.ba_interval:
                    ba = bundle_adjust(
                        world_map, self._K, iterations=self.ba_iterations
                    )
                    world_map = ba.map
                    ba_events.append(
                        {
                            "frame_id": fid,
                            "initial_cost": float(ba.initial_cost),
                            "final_cost": float(ba.final_cost),
                        }
                    )
                    kf_since_ba = 0
                    # fold optimized keyframe poses back into the trajectory
                    self._apply_ba_poses(world_map, poses)
            frame_id += n

        all_poses = np.concatenate(poses) if poses else np.zeros((0, 4, 4))
        pose_graph_applied = False
        if self.enable_pose_graph and loops and len(kf_fids) >= 2:
            all_poses = self._apply_pose_graph(all_poses, kf_fids, loops)
            pose_graph_applied = True
        return {
            "poses": all_poses,
            "loops": loops,
            "ba_events": ba_events,
            "map": world_map,
            "pose_graph_applied": pose_graph_applied,
            **{k: np.concatenate(v) if v else np.zeros((0,)) for k, v in stats.items()},
        }

    def _apply_pose_graph(
        self, all_poses: np.ndarray, kf_fids: list[int], loops: list[dict]
    ) -> np.ndarray:
        """Optimise keyframe nodes with loop edges; propagate corrections.

        Every frame between keyframe k and k+1 inherits keyframe k's rigid
        correction: T_f ← T_k_opt · (T_k_orig⁻¹ · T_f_orig).
        """
        from tpuslam.backend.pose_graph import (
            add_edge,
            graph_from_trajectory,
            optimize_pose_graph,
        )

        fid_to_node = {fid: n for n, fid in enumerate(kf_fids)}
        kf_poses = jnp.asarray(all_poses[np.asarray(kf_fids)], jnp.float32)
        n_edges = len(kf_fids) - 1 + len(loops)
        g = graph_from_trajectory(kf_poses, max_edges=max(2 * n_edges, 8))
        slot = len(kf_fids) - 1
        n_loop_edges = 0
        for lp in loops:
            cand = fid_to_node.get(lp["matched_keyframe_id"])
            query = fid_to_node.get(lp["frame_id"])
            if cand is None or query is None or cand == query:
                continue
            # PnP gives x_query = R·X_cand + t ⇒ T_camc_camq = [R|t]⁻¹.
            T = np.asarray(lp["relative_transform"], np.float64)
            T_rel = np.linalg.inv(T)
            g = add_edge(g, slot, cand, query, jnp.asarray(T_rel, jnp.float32),
                         weight=10.0)
            slot += 1
            n_loop_edges += 1
        if n_loop_edges == 0:
            return all_poses
        out = optimize_pose_graph(g, iterations=12)
        kf_opt = np.asarray(out.nodes[: len(kf_fids)], np.float64)

        corrected = all_poses.copy()
        kf_arr = np.asarray(kf_fids)
        for n, fid in enumerate(kf_fids):
            end = kf_fids[n + 1] if n + 1 < len(kf_fids) else len(all_poses)
            corr = kf_opt[n] @ np.linalg.inv(all_poses[fid])
            for f in range(fid, end):
                corrected[f] = corr @ all_poses[f]
        # frames before the first keyframe keep their original poses
        return corrected

    @staticmethod
    def _apply_ba_poses(world_map, poses: list[np.ndarray]) -> None:
        """Write optimized keyframe poses back into the trajectory chunks."""
        kf_ids = np.asarray(world_map.kf_id)
        kf_valid = np.asarray(world_map.kf_valid)
        R = np.asarray(world_map.kf_R)
        t = np.asarray(world_map.kf_t)
        # flatten view over chunk list
        offsets = np.cumsum([0] + [len(p) for p in poses])
        for slot in np.nonzero(kf_valid)[0]:
            fid = int(kf_ids[slot])
            chunk = int(np.searchsorted(offsets, fid, side="right") - 1)
            local = fid - offsets[chunk]
            if chunk >= len(poses) or local >= len(poses[chunk]):
                continue
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R[slot].T  # cam→world
            T[:3, 3] = -R[slot].T @ t[slot]
            poses[chunk][local] = T
