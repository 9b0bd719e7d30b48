#!/usr/bin/env python
"""Retrieval-quality harness for BoW vocabularies (place recognition).

The reference has no retrieval metrics at all — its loop-closure test only
checks one hard-coded ranking (``test_loop_closure.cpp:81-83``).  This tool
measures, for any vocabulary .npz, the three quantities that decide whether
a vocabulary is usable for loop closure on the available fixtures:

  * **loop ranking** — on each loop fixture (a sequence that revisits its
    start), does the last frame's best non-recent BoW match rank frame 0
    first (the reference oracle), and with what best/second margin;
  * **positive-pair scores** — BoW similarity on known-overlap pairs
    (the loop fixtures' (first, last) pairs);
  * **false-loop rate** — on KITTI forward motion (no revisits), the
    fraction of frame pairs beyond ``MinFramesDifference`` whose score
    clears the configured ``MinAbsoluteScore`` and whose best/second
    ratio clears ``RelativeScoreFactor`` — i.e. would reach geometric
    verification (false candidates cost verification time; false LOOPS
    are what verification exists to kill).

Usage:
  python tools/eval_vocabulary.py configs/vocabulary.npz [more.npz ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from tpuslam.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def _frame_bows(vocab, image_dir: Path, det):
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.pre.stream import FrameStream

    stream = FrameStream(image_dir)
    bows = []
    for i in range(stream.total_frames):
        frame, _ = stream.read_frame(i)
        kps, desc = det.detect_and_compute(jnp.asarray(frame))
        bows.append(np.asarray(vocab.transform(desc, kps.valid)))
    return np.stack(bows)


def evaluate(vocab_path: Path, lc_cfg) -> dict:
    import numpy as np

    from tpuslam.backend.vocabulary import Vocabulary
    from tpuslam.config.schema import DetectorConfig
    from tpuslam.frontend.detector import FeatureDetector

    vocab = Vocabulary.load(vocab_path)
    det = FeatureDetector(DetectorConfig(max_keypoints=512))
    data = REPO_ROOT / "tests" / "data"

    out = {
        "vocabulary": str(vocab_path),
        "words": vocab.num_words,
        "tree": vocab.coarse is not None,
    }

    # --- loop fixtures: ranking + margin + positive-pair scores -------------
    loops = []
    for name in ("images_test_loop", "images_test_loop2"):
        bows = _frame_bows(vocab, data / name, det)
        n = len(bows)
        q = bows[-1]
        scores = bows[:-1] @ q
        # exclude temporally-recent frames, as LoopClosure's gate does
        eligible = np.arange(n - 1) <= (n - 1) - lc_cfg.min_frames_difference
        s = np.where(eligible, scores, -np.inf)
        order = np.argsort(-s)
        best, second = order[0], order[1] if len(order) > 1 else order[0]
        loops.append(
            {
                "fixture": name,
                "rank0_correct": bool(best == 0),
                "best_score": float(s[best]),
                "margin": float(s[best] / max(s[second], 1e-9)),
                "positive_score": float(scores[0]),
            }
        )
    out["loops"] = loops

    # --- forward motion: false-candidate rate ------------------------------
    bows = _frame_bows(vocab, data / "images", det)
    n = len(bows)
    S = bows @ bows.T
    false_cand = 0
    eligible_queries = 0
    for qi in range(lc_cfg.min_db_size, n):
        elig = np.arange(n) <= qi - lc_cfg.min_frames_difference
        if elig.sum() < 1:
            continue
        eligible_queries += 1
        s = np.where(elig, S[qi], -np.inf)
        order = np.argsort(-s)
        best = s[order[0]]
        second = s[order[1]] if len(order) > 1 and np.isfinite(s[order[1]]) else 0.0
        if best >= lc_cfg.min_absolute_score and (
            second <= 0 or best / max(second, 1e-9) >= lc_cfg.relative_score_factor
        ):
            false_cand += 1
    out["forward_false_candidate_rate"] = (
        false_cand / eligible_queries if eligible_queries else 0.0
    )
    out["forward_queries"] = eligible_queries
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("vocabularies", nargs="+")
    parser.add_argument("-c", "--config", default="configs/loop_closure.yml")
    args = parser.parse_args(argv)

    from tpuslam.config.schema import LoopClosureConfig

    lc_cfg = LoopClosureConfig.from_yaml(REPO_ROOT / args.config)

    rows = [evaluate(Path(v), lc_cfg) for v in args.vocabularies]
    hdr = (f"{'vocabulary':<34} {'words':>6} {'tree':>5} "
           f"{'loop1 ok/margin':>16} {'loop2 ok/margin':>16} "
           f"{'pos scores':>13} {'false-cand':>10}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        l1, l2 = r["loops"]
        print(
            f"{Path(r['vocabulary']).name:<34} {r['words']:>6} "
            f"{str(r['tree']):>5} "
            f"{str(l1['rank0_correct']):>5}/{l1['margin']:>8.2f}   "
            f"{str(l2['rank0_correct']):>5}/{l2['margin']:>8.2f}   "
            f"{l1['positive_score']:.2f}/{l2['positive_score']:.2f}  "
            f"{r['forward_false_candidate_rate']:>9.1%}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
