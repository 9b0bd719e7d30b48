#!/usr/bin/env python
"""Long-sequence full-SLAM soak on the real TPU: past the keyframe ring.

Runs the one-dispatch ``--slam`` sequence program over a ~1.5k-frame
sequence — three times the 512-keyframe DB ring — structured as
*distinctive prologue → self-similar filler → revisit*:

  * prologue: the 10 KITTI fixture frames forward (ids 0-9);
  * filler: ping-pong over the middle frames 3..6 only (self-similar —
    the redundancy eviction policy's designed victim);
  * revisit: frames 9..0 backward, re-seeing the full prologue content.

Checks (the round-3 verdict's never-exercised regime):
  * the prologue's DB rows survive ring turnover (redundancy policy) —
    db ids < 10 still present at the end;
  * loop closures fire on the revisit with matched ids in the prologue;
  * trajectory stays finite, pose_ok stays high;
  * device memory is flat by construction (fixed shapes) — the DB/map
    buffers at the end are the same arrays sizes as at frame 0.

Usage (real TPU): ``python tools/soak.py [--frames 1536] [--policy fifo]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tpuslam.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import numpy as np  # noqa: E402

BATCH = 16


def build_sequence(n_frames: int) -> tuple[np.ndarray, int]:
    """(frames, filler_end): prologue 0..9, filler ping-pong 3..6, revisit.

    Every segment boundary is CONTINUOUS (adjacent fixture frames), so
    tracking never teleports: prologue ascends 0..9, descends to the
    filler band, ping-pongs 3..6 (heavily self-similar — the designed
    eviction victim), climbs back to 9, then revisits 8..0.
    """
    from tpuslam.pre.stream import FrameStream

    stream = FrameStream(REPO_ROOT / "tests" / "data" / "images")
    base = [stream.read_frame(i)[0] for i in range(stream.total_frames)]
    prologue = list(range(10)) + list(range(8, 3, -1))  # 0..9, 8..4
    cycle = [3, 4, 5, 6, 5, 4]  # full cycles end at 4, descending
    bridge = [5, 6, 7, 8]  # turn around, climb to the revisit
    revisit = list(range(9, -1, -1))  # 9..0 — re-sees the full prologue
    n_fixed = len(prologue) + len(bridge) + len(revisit)
    n_filler = max(((n_frames - n_fixed) // len(cycle)) * len(cycle), len(cycle))
    filler = [cycle[i % len(cycle)] for i in range(n_filler)]
    idx = prologue + filler + bridge + revisit
    idx += [0] * (n_frames - len(idx))  # stationary tail pad, trackable
    filler_end = len(prologue) + n_filler + len(bridge)
    return np.stack([base[i] for i in idx[:n_frames]]), filler_end


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=1536)
    parser.add_argument("--policy", default=None,
                        help="override EvictionPolicy (fifo|redundancy)")
    parser.add_argument("--tracking", default="vo", choices=("vo", "pnp"))
    parser.add_argument("--vocabulary", default="configs/vocabulary_tree.npz")
    args = parser.parse_args()

    import dataclasses

    import jax

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.system import SlamSystem

    n = args.frames - args.frames % BATCH
    frames, filler_end = build_sequence(n)
    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=BATCH)
    if args.policy:
        config = dataclasses.replace(
            config,
            loop_closure=dataclasses.replace(
                config.loop_closure, eviction_policy=args.policy
            ),
        )
    system = SlamSystem(
        camera, config, vocabulary=REPO_ROOT / args.vocabulary,
        tracking=args.tracking,
    )

    t0 = time.time()
    out = system.run_sequence(frames, seed=0)
    wall = time.time() - t0

    poses = out["poses"]
    pose_ok = np.asarray(out["pose_ok"])
    loops = out["loops"]
    revisit_loops = [
        lp for lp in loops
        if lp["frame_id"] >= filler_end and lp["matched_keyframe_id"] < 10
    ]
    report = {
        "frames": n,
        "wall_s": round(wall, 1),
        "fps_incl_transfer_compile": round(n / wall, 1),
        "pose_ok_rate": round(float(pose_ok.mean()), 4),
        "finite_trajectory": bool(np.isfinite(poses).all()),
        "loops_total": len(loops),
        "revisit_loops_matching_prologue": len(revisit_loops),
        "revisit_examples": [
            (lp["frame_id"], lp["matched_keyframe_id"]) for lp in revisit_loops[:6]
        ],
        "policy": config.loop_closure.eviction_policy,
        "tracking": args.tracking,
        "vocabulary": args.vocabulary,
    }
    print(json.dumps(report))
    ok = (
        report["finite_trajectory"]
        and report["pose_ok_rate"] > 0.95
        and (
            report["revisit_loops_matching_prologue"] > 0
            or config.loop_closure.eviction_policy == "fifo"
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
