#!/usr/bin/env python
"""Train a binary BoW vocabulary from a directory (or directories) of images.

Replacement for the reference's pretrained ``orb_mur.fbow`` blob (absent from
the mount): detects FAST keypoints, computes steered-BRIEF descriptors, and
runs binary k-means (see ``tpuslam.backend.vocabulary``).

Usage:
  python tools/train_vocabulary.py -o configs/vocabulary.npz \
      tests/data/images tests/data/images_test_loop2 [--words 256]
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


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Train a BoW vocabulary")
    parser.add_argument("dirs", nargs="+", help="image directories")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--words", type=int, default=256)
    parser.add_argument("--tree", default=None, metavar="K1,K2",
                        help="train a two-level fbow-style tree vocabulary "
                             "(e.g. 64,64 -> 4096 leaves) instead of a flat "
                             "--words one; assignment cost is O(K1+K2) per "
                             "descriptor regardless of leaf count")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--max-keypoints", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--augment", type=int, default=0,
                        help="per-image geometric/photometric variants to add "
                             "(rotations, scales, flips, gamma) — widens the "
                             "descriptor distribution beyond the raw corpus")
    args = parser.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.backend.vocabulary import Vocabulary
    from tpuslam.config.schema import DetectorConfig
    from tpuslam.frontend.detector import FeatureDetector

    det = FeatureDetector(DetectorConfig(max_keypoints=args.max_keypoints))

    def variants(img):
        yield img
        if not args.augment:
            return
        h, w = img.shape
        rng = np.random.default_rng(args.seed)
        ops = []
        for ang in (-20, -10, 10, 20):
            M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
            ops.append(lambda im, M=M: cv2.warpAffine(im, M, (w, h)))
        for sc in (0.7, 1.4):
            ops.append(lambda im, sc=sc: cv2.resize(
                cv2.resize(im, None, fx=sc, fy=sc), (w, h)))
        ops.append(lambda im: im[:, ::-1].copy())
        ops.append(lambda im: np.clip(
            255.0 * (im / 255.0) ** 0.6, 0, 255).astype(np.uint8))
        ops.append(lambda im: np.clip(
            255.0 * (im / 255.0) ** 1.6, 0, 255).astype(np.uint8))
        rng.shuffle(ops)
        for op in ops[: args.augment]:
            yield op(img)

    corpus = []
    for d in args.dirs:
        for p in sorted(Path(d).iterdir()):
            if p.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            n_desc = 0
            for var in variants(np.asarray(img, np.uint8)):
                kps, desc = det.detect_and_compute(jnp.asarray(var))
                mask = np.asarray(kps.valid)
                corpus.append(np.asarray(desc)[mask])
                n_desc += int(mask.sum())
            print(f"{p.name}: {n_desc} descriptors")
    total = sum(len(c) for c in corpus)
    branching = None
    if args.tree:
        k1, k2 = (int(x) for x in args.tree.split(","))
        branching = (k1, k2)
        print(f"training on {total} descriptors from {len(corpus)} images "
              f"→ {k1}×{k2} tree ({k1 * k2} leaves)")
    else:
        print(f"training on {total} descriptors from {len(corpus)} images "
              f"→ {args.words} words")
    vocab = Vocabulary.fit(corpus, num_words=args.words, iters=args.iters,
                           seed=args.seed, branching=branching)
    vocab.save(args.output)
    print(f"saved to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
