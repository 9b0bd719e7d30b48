#!/usr/bin/env python
"""Headline benchmark: monocular VO throughput (frames/sec) on one TPU chip.

Protocol: the 10 KITTI fixture frames (1392×512 grayscale) are tiled to a
longer sequence and pushed through the full jitted VO pipeline —
undistortion, FAST+NMS (1024-keypoint capacity), steered BRIEF, brute-force
Hamming matching with ratio test, 2048-hypothesis batched-RANSAC essential
matrix, cheirality pose recovery, and trajectory composition.  Steady-state
timing excludes compilation (one warm-up chunk).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured FPS / 500 (the BASELINE.md north-star target;
the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from tpuslam.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.slam import SlamPipeline
    from tpuslam.pre.stream import FrameStream

    batch = 16
    n_frames = 96  # 6 chunks of 16

    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=batch)
    pipeline = SlamPipeline(camera, config)

    stream = FrameStream(REPO_ROOT / "tests" / "data" / "images")
    base = [stream.read_frame(i)[0] for i in range(stream.total_frames)]
    frames = np.stack([base[i % len(base)] for i in range(n_frames)])

    state = pipeline.initial_state()
    key = jax.random.PRNGKey(0)
    valid = np.ones(batch, bool)

    # Warm-up / compile.
    chunk = jax.numpy.asarray(frames[:batch])
    result, state_w = pipeline._chunk_fn(chunk, jax.numpy.asarray(valid), state, key)
    jax.block_until_ready(result)

    # Steady-state: stream all chunks through the compiled program.
    device_chunks = [
        jax.device_put(frames[s : s + batch]) for s in range(0, n_frames, batch)
    ]
    jax.block_until_ready(device_chunks)
    valid_d = jax.numpy.asarray(valid)

    # Pre-split keys: a host-side jax.random.split per chunk costs a full
    # dispatch round-trip through the device tunnel.
    subkeys = jax.random.split(key, len(device_chunks))
    jax.block_until_ready(subkeys)

    t0 = time.perf_counter()
    st = state
    for i, dc in enumerate(device_chunks):
        result, st = pipeline._chunk_fn(dc, valid_d, st, subkeys[i])
    jax.block_until_ready((result, st))
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    print(
        json.dumps(
            {
                "metric": "vo_throughput_kitti",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
