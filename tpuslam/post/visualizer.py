"""Debug visualisation: keypoints, matches, depth-coloured matches, trajectory.

The reference ``Visualizer`` is an empty skeleton (``visualizer.hpp:10-17``);
its working visual output lives in tests: ``cv::drawKeypoints`` /
``drawMatches`` and a depth-coloured match renderer
(``test/frontend/test_pose_estimator.cpp:45-106``).  This module provides
the equivalents as host-side helpers producing PNG files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_bgr(gray: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.cvtColor(np.asarray(gray, np.uint8), cv2.COLOR_GRAY2BGR)


def draw_keypoints(
    image: np.ndarray, kps, path: str | Path | None = None
) -> np.ndarray:
    """Render keypoints as green circles (cv::drawKeypoints analog)."""
    import cv2

    img = _to_bgr(image)
    xy = np.asarray(kps.xy)
    valid = np.asarray(kps.valid)
    for (x, y) in xy[valid]:
        cv2.circle(img, (int(x), int(y)), 3, (0, 255, 0), 1)
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), img)
    return img


def draw_matches(
    image1: np.ndarray, kps1, image2: np.ndarray, kps2, matches,
    path: str | Path | None = None,
) -> np.ndarray:
    """Side-by-side match rendering (cv::drawMatches analog)."""
    import cv2

    img1 = _to_bgr(image1)
    img2 = _to_bgr(image2)
    h = max(img1.shape[0], img2.shape[0])
    w1 = img1.shape[1]
    canvas = np.zeros((h, w1 + img2.shape[1], 3), np.uint8)
    canvas[: img1.shape[0], :w1] = img1
    canvas[: img2.shape[0], w1:] = img2
    xy1 = np.asarray(kps1.xy)
    xy2 = np.asarray(kps2.xy)
    rng = np.random.default_rng(0)
    for q, t, v in zip(
        np.asarray(matches.query_idx), np.asarray(matches.train_idx),
        np.asarray(matches.valid),
    ):
        if not v:
            continue
        p1 = tuple(int(c) for c in xy1[q])
        p2 = (int(xy2[t][0]) + w1, int(xy2[t][1]))
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        cv2.circle(canvas, p1, 3, color, 1)
        cv2.circle(canvas, p2, 3, color, 1)
        cv2.line(canvas, p1, p2, color, 1)
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), canvas)
    return canvas


def draw_depth_matches(
    image: np.ndarray, pts: np.ndarray, depths: np.ndarray,
    valid: np.ndarray | None = None, path: str | Path | None = None,
) -> np.ndarray:
    """Depth-coloured keypoint rendering (near=red → far=blue), the analog of
    the renderer in reference ``test_pose_estimator.cpp:45-106``."""
    import cv2

    img = _to_bgr(image)
    pts = np.asarray(pts)
    depths = np.asarray(depths)
    if valid is None:
        valid = np.ones(len(pts), bool)
    valid = np.asarray(valid) & np.isfinite(depths) & (depths > 0)
    if valid.any():
        d = depths[valid]
        lo, hi = np.percentile(d, 5), np.percentile(d, 95)
        for (x, y), z in zip(pts[valid], d):
            a = float(np.clip((z - lo) / max(hi - lo, 1e-9), 0, 1))
            color = (int(255 * a), 0, int(255 * (1 - a)))  # BGR: near red→far blue
            cv2.circle(img, (int(x), int(y)), 4, color, -1)
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), img)
    return img


def plot_trajectory(
    poses: np.ndarray, path: str | Path, gt_poses: np.ndarray | None = None
) -> None:
    """Top-down (x, z) trajectory plot as PNG (matplotlib, Agg backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(poses[:, 0, 3], poses[:, 2, 3], "b-", label="estimate")
    if gt_poses is not None:
        gt = np.asarray(gt_poses)
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.grid(True, alpha=0.3)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
