"""SIFT autopilot: auto-generate start->end point trajectories when the
user draws none (reference src/models/sift_match.py:9-163, used by the
Gradio app at app_org.py:389-414).

Host-side OpenCV (SIFT + BFMatcher + Lowe ratio test) with the reference's
four selection methods; returns (2, topk, 2) numpy points or None."""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False


def sift_match(img1: np.ndarray, img2: np.ndarray, thr: float = 0.5,
               topk: int = 5, method: str = "max_dist",
               rng: Optional[np.random.RandomState] = None) -> Optional[np.ndarray]:
    """img1/img2: (H, W, 3) uint8 RGB.  Returns (2, topk', 2) [start, end]
    xy points or None when no matches survive."""
    assert method in ("max_dist", "random", "max_score", "max_score_even")
    g1 = cv2.cvtColor(img1, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(img2, cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(g1, None)
    kp2, des2 = sift.detectAndCompute(g2, None)
    if des1 is None or des2 is None or len(kp1) < 2 or len(kp2) < 2:
        return None
    matches = cv2.BFMatcher().knnMatch(des1, des2, k=2)
    matches = [m for m in matches if len(m) == 2]

    point_list = []
    if method in ("max_score", "max_score_even"):
        matches = sorted(matches, key=lambda x: x[0].distance / max(x[1].distance, 1e-9))
        anchors = []
        for m, n in matches[:topk]:
            pt1 = np.asarray(kp1[m.queryIdx].pt)
            if method == "max_score_even" and any(
                    np.linalg.norm(pt1 - a) < 50 for a in anchors):
                continue
            pt2 = np.asarray(kp2[m.trainIdx].pt)
            anchors.append(pt1)
            point_list.append(np.stack([pt1, pt2]))
    else:
        dists = []
        for m, n in matches:
            if m.distance < thr * n.distance:
                pt1 = np.asarray(kp1[m.queryIdx].pt)
                pt2 = np.asarray(kp2[m.trainIdx].pt)
                dists.append(np.linalg.norm(pt1 - pt2))
                point_list.append(np.stack([pt1, pt2]))
        if point_list:
            idx = np.argsort(np.asarray(dists))
            if method == "max_dist":
                idx = idx[-topk:]
            else:  # random
                rng = rng or np.random.RandomState()
                idx = rng.choice(idx, min(topk, len(idx)), replace=False)
            point_list = [point_list[i] for i in idx]

    if not point_list:
        return None
    pts = np.stack(point_list)        # (k, 2, 2)
    return pts.transpose(1, 0, 2).astype(np.float32)  # (2, k, 2)
