#!/usr/bin/env python
"""Headline benchmark: monocular VO throughput (frames/sec) on one TPU chip.

Protocol: the 10 KITTI fixture frames (1392×512 grayscale) are tiled to a
longer sequence and pushed through the full jitted VO pipeline —
undistortion, FAST+NMS (1024-keypoint capacity), steered BRIEF, brute-force
Hamming matching with ratio test, 1024-hypothesis batched-RANSAC essential
matrix, cheirality pose recovery, and trajectory composition.  Steady-state
timing excludes compilation (one warm-up pass per program); frames are
staged on device first (the remote tunnel's host→device copy rate is not
the system under test).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline VO number, plus "slam_fps" (full system: tracking + landmark map +
loop closure + windowed BA), "pnp_fps" (map-centric PnP tracking mode) and
"slam_pnp_fps" (PnP tracking + LC + BA over one shared map) so the
full-system modes are captured on the official scoreboard too.
``--slam`` / ``--pnp`` run just that mode and print its line alone.

Process architecture: the combined (no-flag) run is an ORCHESTRATOR that
never imports jax.  The axon remote-TPU backend is single-client — a
second process touching the device while another holds it blocks
indefinitely (measured: a child ``jax.devices()`` hangs >120 s while the
parent holds a live buffer) — and the tunnel has transient multi-minute
degradation windows (round 3's combined run lost every aux mode to one).
So each mode runs as its own sequential subprocess with a per-mode
timeout and one retry, and the merged record line is re-printed after
every mode completes: the last JSON line on stdout is always the most
complete scoreboard, no matter when the run is killed.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from tpuslam.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import numpy as np  # noqa: E402

BATCH = 16
N_FRAMES = 96


def _vocab():
    """Production vocabulary: the hierarchical tree (thresholds in
    configs/loop_closure.yml are calibrated for it); flat fallback."""
    tree = REPO_ROOT / "configs" / "vocabulary_tree.npz"
    return tree if tree.is_file() else REPO_ROOT / "configs" / "vocabulary.npz"


def _load_frames(n_frames: int) -> np.ndarray:
    from tpuslam.pre.stream import FrameStream

    stream = FrameStream(REPO_ROOT / "tests" / "data" / "images")
    base = [stream.read_frame(i)[0] for i in range(stream.total_frames)]
    # Ping-pong tiling (0..9,8..1,0..9,…): a CONTINUOUS camera path, not
    # the old `i % 10` wrap whose frame-9→frame-0 teleports lose tracking
    # every cycle.  VO timing is shape-dominated and unaffected; SLAM mode
    # is content-sensitive now that lost frames trigger real relocalization
    # work (measured: the wrap teleports fired reloc on most chunks,
    # +80 ms/chunk, turning the steady-state benchmark into a worst-case
    # relocalization benchmark).  Reverse traversal is ordinary backward
    # camera motion — trackable, and a fair stand-in for a loopy sequence.
    period = 2 * (len(base) - 1)
    idx = [min(i % period, period - i % period) for i in range(n_frames)]
    return np.stack([base[i] for i in idx])


def _staged(frames: np.ndarray):
    import jax

    frames_d = jax.device_put(frames)
    jax.block_until_ready(frames_d)
    return frames_d


def _pipelined_fps(enqueue, n_frames: int, k: int = 8) -> float:
    """Steady-state throughput: k fresh-keys dispatches, one barrier.

    The single-dispatch protocol charges the remote tunnel's dispatch
    round trip (~27 ms measured) to every program — a tunnel artifact,
    not system cost; a deployed streaming driver pipelines dispatches.
    ``enqueue(seed)`` must submit WITHOUT blocking and return the output
    pytree; fresh keys per dispatch keep the result cache out.
    """
    import jax

    times = []
    for rep in (0, 1, 2):
        t0 = time.perf_counter()
        outs = [enqueue(1000 + rep * k + i) for i in range(k)]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    return k * n_frames / sorted(times)[len(times) // 2]


def _median_fps(dispatch, n_frames: int, seeds=(1, 2, 3, 4, 5, 6, 7)) -> float:
    """Median of several fresh-keys timed dispatches.

    A single dispatch through the remote tunnel varies by ±10-30% run to
    run (enough that round 2's official capture read 493 FPS against
    builder runs of 517 on the same protocol); the median of seven is
    stable to a few percent (three still drew ±25 FPS between combined
    runs — each extra dispatch costs ~0.2 s, so seven is cheap insurance
    for a scoreboard number).  Each dispatch uses a DIFFERENT PRNG seed so
    the axon client's result cache can never serve a repeat (BASELINE.md
    "measurement warning") — the program shape is identical, only key
    values differ.
    """
    times = []
    for seed in seeds:
        t0 = time.perf_counter()
        dispatch(seed)
        times.append(time.perf_counter() - t0)
    return n_frames / sorted(times)[len(times) // 2]


def measure_vo(frames_d, config_dir: str = "configs") -> float:
    """One-dispatch VO over the staged sequence (the headline protocol)."""
    import jax

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.slam import SlamPipeline

    camera = Camera.from_yaml(REPO_ROOT / config_dir / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / config_dir, batch_size=BATCH)
    pipeline = SlamPipeline(camera, config)

    state = pipeline.initial_state()
    chunks_d = frames_d.reshape(-1, BATCH, *frames_d.shape[1:])
    chunk_valid = jax.numpy.ones((chunks_d.shape[0], BATCH), bool)
    # Fresh PRNG keys per dispatch (warm-up included): the axon client can
    # serve a repeat of an identical (executable, buffers) pair from a
    # result cache, which reports transfer latency as compute (BASELINE.md
    # "measurement warning").  Fresh keys force a real run at identical
    # program shape.
    def dispatch(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), chunks_d.shape[0])
        r, s = pipeline._sequence_fn(chunks_d, chunk_valid, state, keys)
        jax.block_until_ready((r, s))

    dispatch(0)  # compile + warm
    return _median_fps(dispatch, N_FRAMES)


def measure_vo_pipelined(
    frames_d, k: int = 8, config_dir: str = "configs"
) -> float | None:
    """Steady-state VO throughput: k fresh-keys dispatches, one barrier.

    The single-dispatch protocol charges the remote tunnel's full
    dispatch round trip (~30 ms) to every 96-frame program — a tunnel
    artifact, not system cost; a deployed streaming driver pipelines
    dispatches (``SlamSystem.run()`` never blocks mid-stream).  Each
    dispatch still uses fresh PRNG keys (result-cache-proof) and the
    chain is timed end-to-end, so per-dispatch compute is fully real;
    only the round trip amortises (cost → RT/k).
    """
    import jax

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.slam import SlamPipeline

    camera = Camera.from_yaml(REPO_ROOT / config_dir / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / config_dir, batch_size=BATCH)
    pipeline = SlamPipeline(camera, config)
    state = pipeline.initial_state()
    chunks_d = frames_d.reshape(-1, BATCH, *frames_d.shape[1:])
    chunk_valid = jax.numpy.ones((chunks_d.shape[0], BATCH), bool)

    def enqueue(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), chunks_d.shape[0])
        return pipeline._sequence_fn(chunks_d, chunk_valid, state, keys)

    jax.block_until_ready(enqueue(0))  # compile + warm
    return _pipelined_fps(enqueue, N_FRAMES, k=k)


def measure_pnp(frames_d) -> float:
    """One-dispatch map-centric PnP tracking over the staged sequence."""
    import jax

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.slam import SlamPipeline

    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=BATCH)
    pipeline = SlamPipeline(camera, config, tracking="pnp")

    state = pipeline.initial_pnp_state()
    chunks_d = frames_d.reshape(-1, BATCH, *frames_d.shape[1:])
    chunk_valid = jax.numpy.ones((chunks_d.shape[0], BATCH), bool)
    # Fresh keys per dispatch (see measure_vo / _median_fps).
    def enqueue(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), chunks_d.shape[0])
        return pipeline._sequence_pnp_fn(chunks_d, chunk_valid, state, keys)

    def dispatch(seed):
        jax.block_until_ready(enqueue(seed))

    dispatch(0)  # compile + warm
    return _median_fps(dispatch, N_FRAMES), _pipelined_fps(enqueue, N_FRAMES)


def measure_slam(frames_d, tracking: str = "vo") -> float:
    """Full SLAM system: tracking + map association + loop closure + BA.

    ``tracking="pnp"`` times the map-centric composition (PnP tracking
    against the shared BA-optimised map — the reference's declared
    Backend/Map architecture, ``backend.hpp:13-17`` + ``map.hpp:9-21``).

    Same staged protocol as ``measure_vo``: the one-dispatch sequence
    program (``SlamSystem._sequence_jit``) is timed directly on pre-staged
    device chunks with fresh PRNG keys.  (``run_sequence`` additionally
    pays the remote tunnel's host→device frame copy and host-side
    trajectory folding — ~1.4 s for this 96-frame clip at ~57 MB/s, which
    would measure the tunnel, not the system; on a local TPU host the
    streaming path costs what the device program costs.)
    """
    import jax
    import jax.numpy as jnp

    from tpuslam.backend.map import empty_assoc, empty_map
    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.system import SlamSystem

    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=BATCH)
    system = SlamSystem(
        camera, config,
        vocabulary=_vocab(),
        tracking=tracking,
    )
    chunks_d = frames_d.reshape(-1, BATCH, *frames_d.shape[1:])
    n_chunks = chunks_d.shape[0]
    chunk_valid = jnp.ones((n_chunks, BATCH), bool)
    db = system.loop_closure.new_db(
        config.detector.max_keypoints, config.detector.descriptor_bytes
    )
    if tracking == "pnp":
        carry0 = (
            system.pipeline.initial_pnp_state(),
            db,
            jnp.asarray(0, jnp.int32),
        )
    else:
        carry0 = (
            system.pipeline.initial_state(),
            empty_map(system.ba_window, system.max_map_points),
            empty_assoc(config.detector.max_keypoints),
            db,
            jnp.asarray(0, jnp.int32),
        )

    def keys_for(seed):
        return jax.vmap(
            lambda c: jax.random.fold_in(jax.random.PRNGKey(seed), c)
        )(jnp.arange(n_chunks, dtype=jnp.int32))

    def enqueue(seed):
        _, outs = system._sequence_jit(
            chunks_d, chunk_valid, carry0, keys_for(seed)
        )
        return outs["poses"]

    def dispatch(seed):
        jax.block_until_ready(enqueue(seed))

    dispatch(0)  # compile + warm
    return _median_fps(dispatch, N_FRAMES), _pipelined_fps(enqueue, N_FRAMES)


def measure_multiseq(frames: "np.ndarray") -> tuple[float, int]:
    """Batched multi-sequence SLAM throughput (BASELINE config 5).

    One full PnP-SLAM sequence program per device, the sequence axis
    sharded over a mesh of every available chip (``dist/mesh.py``); on a
    v5e-8 this is 8 KITTI sequences, on a single chip it degenerates to
    S=1 (the mode exists so the config-5 number is capturable the moment
    a multi-chip host is attached).  Aggregate frames/sec across all
    sequences, staged + fresh-keys protocol as everywhere else.
    """
    import jax
    import jax.numpy as jnp

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.dist.mesh import make_device_mesh, sequence_sharding
    from tpuslam.model.system import SlamSystem

    S = len(jax.devices())
    mesh = make_device_mesh(S)
    sh = sequence_sharding(mesh)

    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=BATCH)
    system = SlamSystem(
        camera,
        config,
        vocabulary=_vocab(),
        tracking="pnp",
    )
    n_chunks = N_FRAMES // BATCH
    chunks = frames.reshape(1, n_chunks, BATCH, *frames.shape[1:])
    chunks_d = jax.device_put(
        jnp.broadcast_to(jnp.asarray(chunks), (S, *chunks.shape[1:])), sh
    )
    chunk_valid = jnp.ones((S, n_chunks, BATCH), bool)
    db = system.loop_closure.new_db(
        config.detector.max_keypoints, config.detector.descriptor_bytes
    )
    carry0 = (
        system.pipeline.initial_pnp_state(),
        db,
        jnp.asarray(0, jnp.int32),
    )
    carry_s = jax.tree.map(lambda a: jnp.broadcast_to(a, (S, *a.shape)), carry0)

    def keys_for(seed):
        base = jax.random.split(jax.random.PRNGKey(seed), S)
        return jax.vmap(lambda k: jax.random.split(k, n_chunks))(base)

    # shard_map, not vmap: each sequence runs the unbatched program on its
    # own core so the chunk-level lax.conds (LC verification skip, PnP's
    # RANSAC fallback) stay real branches instead of both-branches selects
    # (measured: S=1 219 FPS vmapped vs ~413 for the unbatched program).
    from tpuslam.dist.mesh import shard_sequence_program

    step = shard_sequence_program(system._sequence_impl, mesh)
    def dispatch(seed):
        _, outs = step(chunks_d, chunk_valid, carry_s, keys_for(seed))
        jax.block_until_ready(outs["poses"])

    dispatch(0)  # compile + warm
    return _median_fps(dispatch, S * N_FRAMES), S


def measure_localization() -> dict:
    """Localization-only mode: track a frozen, checkpointed map.

    Protocol (the BASELINE "marginal rate" capture, now driver-run): one
    UNTIMED mapping pass over the 96-frame clip builds the map+DB; the
    frozen-map localization sequence program is then timed over a
    96-frame and a 192-frame staged clip (same ping-pong tiling — the
    longer clip stays inside mapped territory), and the steady-state
    number is the marginal rate (192−96)/(t₁₉₂−t₉₆), which cancels the
    one-time bootstrap lock-in that dominates short-clip averages.
    """
    import jax
    import jax.numpy as jnp

    from tpuslam.common.camera import Camera
    from tpuslam.config.schema import SlamConfig
    from tpuslam.model.system import SlamSystem

    camera = Camera.from_yaml(REPO_ROOT / "configs" / "camera.yml")
    config = SlamConfig.from_yaml_dir(REPO_ROOT / "configs", batch_size=BATCH)
    frames96 = _load_frames(N_FRAMES)
    frames192 = _load_frames(2 * N_FRAMES)

    mapper = SlamSystem(
        camera, config,
        vocabulary=_vocab(),
        tracking="pnp", enable_pose_graph=False,
    )
    out = mapper.run_sequence(frames96, seed=0)

    loc = SlamSystem(
        camera, config,
        vocabulary=_vocab(),
        tracking="pnp", localization_only=True, enable_pose_graph=False,
    )
    carry0 = (
        loc.pipeline.initial_pnp_state()._replace(map=out["map"]),
        out["db"],
        jnp.asarray(0, jnp.int32),
    )

    def timed(frames):
        chunks_d = _staged(frames).reshape(-1, BATCH, *frames.shape[1:])
        n_chunks = chunks_d.shape[0]
        chunk_valid = jnp.ones((n_chunks, BATCH), bool)

        def keys_for(seed):
            return jax.vmap(
                lambda c: jax.random.fold_in(jax.random.PRNGKey(seed), c)
            )(jnp.arange(n_chunks, dtype=jnp.int32))

        def dispatch(seed):
            _, outs = loc._sequence_jit(
                chunks_d, chunk_valid, carry0, keys_for(seed)
            )
            jax.block_until_ready(outs["poses"])

        dispatch(0)  # compile + warm
        times = []
        for seed in (1, 2, 3, 4, 5, 6, 7):
            t0 = time.perf_counter()
            dispatch(seed)
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    t96 = timed(frames96)
    t192 = timed(frames192)
    marginal = N_FRAMES / max(t192 - t96, 1e-9)
    return {
        "metric": "localization_throughput_kitti",
        "value": round(marginal, 2),
        "unit": "frames/sec",
        "vs_baseline": round(marginal / 500.0, 4),
        "from_scratch_96f": round(N_FRAMES / t96, 2),
    }


def _probe_device(timeout_s: float = 180.0) -> None:
    """Fail fast (with one explanatory JSON line) when the device hangs.

    The remote axon tunnel can go down in a mode where ``jax.devices()``
    blocks forever (observed for hours on 2026-08-17) — a hung benchmark
    records nothing.  Probe in a SUBPROCESS with a generous timeout before
    touching jax in this process; a healthy-but-slow tunnel passes (first
    contact is ~seconds; compiles are slow, device discovery is not).
    """
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, check=True,
        )
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "vo_throughput_kitti",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "error": f"device backend unreachable: jax.devices() hung "
                     f">{timeout_s:.0f}s (axon tunnel down?) — not a "
                     f"regression, see BASELINE.md for last measured values",
        }))
        sys.exit(1)
    except subprocess.CalledProcessError:
        pass  # probe import errors: let the real run surface them


def main() -> None:
    single_mode = any(f in sys.argv for f in (
        "--slam", "--pnp", "--pyramid", "--fast", "--multiseq", "--vo-only",
        "--localize",
    ))
    if not single_mode:
        # Combined scoreboard run: orchestrate subprocesses, never import
        # jax in this process (single-client axon device — see module doc).
        _probe_device()
        orchestrate()
        return
    if not os.environ.get("BENCH_CHILD"):
        _probe_device()
    if "--localize" in sys.argv:
        print(json.dumps(measure_localization()))
        return
    frames_d = _staged(_load_frames(N_FRAMES))
    if "--slam" in sys.argv:
        tracking = "pnp" if "--pnp" in sys.argv else "vo"
        fps, pipe = measure_slam(frames_d, tracking=tracking)
        print(json.dumps({
            "metric": f"slam_{tracking}_throughput_kitti"
            if tracking == "pnp" else "slam_throughput_kitti",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 500.0, 4),
            "pipelined_fps": round(pipe, 2),
        }))
        return
    if "--pyramid" in sys.argv:
        # 4-level ORB-style pyramid profile (configs/multiscale); recorded
        # in BASELINE.md — the headline protocol stays single-scale (the
        # KITTI forward-motion configuration).
        fps = measure_vo(frames_d, config_dir="configs/multiscale")
        pipe = measure_vo_pipelined(frames_d, config_dir="configs/multiscale")
        print(json.dumps({
            "metric": "vo_pyramid_throughput_kitti",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 500.0, 4),
            "pipelined_fps": round(pipe, 2),
        }))
        return
    if "--fast" in sys.argv:
        # Halved RANSAC hypothesis budget (configs/fast): the high-inlier
        # continuous-video profile; fixture ATE parity identical to the
        # default (see configs/fast/pose_estimator.yml for the envelope).
        fps = measure_vo(frames_d, config_dir="configs/fast")
        pipe = measure_vo_pipelined(frames_d, config_dir="configs/fast")
        print(json.dumps({
            "metric": "vo_fast_throughput_kitti",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 500.0, 4),
            "pipelined_fps": round(pipe, 2),
        }))
        return
    if "--multiseq" in sys.argv:
        fps, n_seq = measure_multiseq(_load_frames(N_FRAMES))
        print(json.dumps({
            "metric": "multiseq_slam_throughput_kitti",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 500.0, 4),
            "sequences": n_seq,
        }))
        return
    if "--pnp" in sys.argv:
        fps, pipe = measure_pnp(frames_d)
        print(json.dumps({
            "metric": "pnp_throughput_kitti",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 500.0, 4),
            "pipelined_fps": round(pipe, 2),
        }))
        return

    vo_fps = measure_vo(frames_d)
    record = {
        "metric": "vo_throughput_kitti",
        "value": round(vo_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vo_fps / 500.0, 4),
    }
    pipelined = measure_vo_pipelined(frames_d)
    if pipelined:
        # Auxiliary, clearly labeled: K fresh-keys dispatches enqueued
        # back-to-back and blocked once — the steady-state deployment
        # number, with the remote tunnel's per-dispatch round trip
        # amortised instead of charged to every dispatch (the headline
        # `value` stays the round-4-comparable single-dispatch median).
        record["pipelined_fps"] = round(pipelined, 2)
    print(json.dumps(record), flush=True)


def _env_float(name: str, default: float) -> float:
    """Defensive env parse: a malformed value must not kill the run."""
    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _run_mode(args: list[str], timeout_s: float) -> dict | None:
    """Run one bench mode as a subprocess; parse its JSON line.

    Subprocess isolation is load-bearing, not hygiene: the single-client
    axon device means any in-process hang (tunnel degradation mid-
    dispatch) is unrecoverable, while a killed subprocess releases the
    device for the next mode (verified: the device answers normally
    after a SIGKILLed child).
    """
    import subprocess

    cmd = [sys.executable, str(REPO_ROOT / "bench.py"), *args]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            env={**os.environ, "BENCH_CHILD": "1"},
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed((proc.stdout or "").strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and "value" in rec:
            return rec
    return None


def orchestrate() -> None:
    """Combined scoreboard run: every mode in its own timed subprocess.

    The merged record is (re-)printed after each mode, so the LAST JSON
    line on stdout is always the most complete scoreboard even if the
    driver kills this process mid-run.  Per-mode timeout default 420 s
    (cold-cache compiles of the full-SLAM program take minutes through
    the tunnel; warm-cache modes finish in ~30-60 s), one retry per mode
    while total budget remains — a transient degradation window (the
    failure that voided round 3's aux block) passes between attempts.
    """
    budget_s = _env_float("BENCH_BUDGET_S", 3600.0)
    per_mode_s = _env_float("BENCH_MODE_BUDGET_S", 420.0)
    t0 = time.monotonic()
    # No fabricated headline: value/vs_baseline appear only once the vo
    # subprocess actually reports (a skipped headline must be
    # distinguishable from a measured 0.0 regression).
    record: dict = {
        "metric": "vo_throughput_kitti",
        "unit": "frames/sec",
    }
    modes = (
        (None, ["--vo-only"]),
        ("slam_fps", ["--slam"]),
        ("pnp_fps", ["--pnp"]),
        # Map-centric composition: PnP tracking + LC + BA sharing one
        # map (the reference's declared Backend/Map architecture).
        ("slam_pnp_fps", ["--slam", "--pnp"]),
        # The remaining scoreboard lines, under the same driver protocol
        # (round-4 verdict: builder-reported single-mode numbers drift
        # from driver-captured ones — capture everything in one run).
        ("multiseq_fps", ["--multiseq"]),
        ("fast_fps", ["--fast"]),
        ("pyramid_fps", ["--pyramid"]),
        ("localization_fps", ["--localize"]),
    )
    skipped = []
    for key, args in modes:
        rec = None
        for attempt in (1, 2):
            remaining = budget_s - (time.monotonic() - t0)
            if remaining < 30:
                break
            print(f"[bench] {key or 'vo'} attempt {attempt} "
                  f"({remaining:.0f}s left)", file=sys.stderr, flush=True)
            rec = _run_mode(args, min(per_mode_s, remaining))
            if rec is not None:
                break
        if rec is None:
            skipped.append(key or "vo")
        elif key is None:
            record.update(rec)
        else:
            record[key] = rec["value"]
            if "pipelined_fps" in rec:
                record[key.replace("_fps", "_pipelined_fps")] = rec[
                    "pipelined_fps"
                ]
            if "from_scratch_96f" in rec:
                record["localization_from_scratch_96f"] = rec[
                    "from_scratch_96f"
                ]
        if skipped:
            record["aux_skipped"] = (
                f"{'+'.join(skipped)}: mode timed out or budget exhausted "
                "(degraded tunnel?) — see BASELINE.md for last values"
            )
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
