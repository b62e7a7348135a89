"""Offline dataset construction — the 4-step preprocessing pipeline
(reference dataset_construction/, SURVEY §2.4), generalized to configurable
paths.

step1: video files -> frame JPEGs (cv2 VideoCapture, step1_frame_split.py:8-24)
step2: frame folders -> frame-index-major TrainData layout
       (step2_frame_to_folder.py:27-54 — the reference loop is commented out
       in the snapshot; the logic reconstructed here is: every ``gap``-th
       frame i goes to TrainData/frame_<i>/sample_<video>.png)
step3: inverse restructure for checking (step3_data_check.py:27-41)
step4: Farnebäck optical-flow anomaly gate (step4_flow_check.py:13-83) —
       flow computed host-side with OpenCV (exact parameter parity:
       pyr_scale .5, levels 3, win 15, iter 3, poly 5/1.2), the per-pixel
       cosine-similarity gate math jitted in JAX.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False


def split_video_into_frames(video_path: str, save_folder: str) -> int:
    """step1 (step1_frame_split.py:8-24): every frame as frame_%04d.jpg."""
    os.makedirs(save_folder, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    count = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        cv2.imwrite(os.path.join(save_folder, f"frame_{count:04d}.jpg"), frame)
        count += 1
    cap.release()
    return count


def split_tree(raw_root: str, out_root: str) -> Dict[str, int]:
    """step1 driver: walks <raw_root>/<disaster>/<subject>/<video>
    (step1_frame_split.py:26-45)."""
    os.makedirs(out_root, exist_ok=True)
    counts = {}
    for disaster in sorted(os.listdir(raw_root)):
        dpath = os.path.join(raw_root, disaster)
        if not os.path.isdir(dpath):
            continue
        for subject in sorted(os.listdir(dpath)):
            spath = os.path.join(dpath, subject)
            for video in sorted(os.listdir(spath)):
                name = os.path.splitext(video)[0]
                counts[name] = split_video_into_frames(
                    os.path.join(spath, video), os.path.join(out_root, name))
    return counts


def folderize(split_root: str, train_root: str, gap: int = 10,
              max_frames: int = 50) -> int:
    """step2: frame-index-major TrainData layout.  For each video v and
    index i < max_frames, copy frame_(gap*i).jpg ->
    TrainData/frame_<i:02d>/sample_<v:03d>.png."""
    shutil.rmtree(train_root, ignore_errors=True)
    os.makedirs(train_root, exist_ok=True)
    videos = sorted(os.listdir(split_root))
    n_folders = 0
    for vid_num, video in enumerate(videos):
        vpath = os.path.join(split_root, video)
        frames = sorted(f for f in os.listdir(vpath) if f.endswith((".jpg", ".png")))
        # every gap-th frame i with gap*i < len(frames)
        n = min((len(frames) - 1) // gap + 1 if frames else 0, max_frames)
        for i in range(n):
            folder = os.path.join(train_root, f"frame_{i:02d}")
            os.makedirs(folder, exist_ok=True)
            src = os.path.join(vpath, f"frame_{gap * i:04d}.jpg")
            if not os.path.exists(src):
                continue
            shutil.copyfile(src, os.path.join(folder, f"sample_{vid_num:03d}.png"))
            n_folders = max(n_folders, i + 1)
    return n_folders


def unfolderize(train_root: str, seq_root: str):
    """step3 (step3_data_check.py:27-41): TrainData/frame_XX/<sample>.png ->
    TrainDataSequence/<sample>/frame_XX.png for visual checking."""
    os.makedirs(seq_root, exist_ok=True)
    for frame_folder in sorted(os.listdir(train_root)):
        fpath = os.path.join(train_root, frame_folder)
        if not os.path.isdir(fpath):
            continue
        for sample in os.listdir(fpath):
            name = os.path.splitext(sample)[0]
            dst = os.path.join(seq_root, name)
            os.makedirs(dst, exist_ok=True)
            shutil.copyfile(os.path.join(fpath, sample),
                            os.path.join(dst, f"{frame_folder}.png"))


def farneback_flow(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Farnebäck dense flow, exact reference parameters
    (step4_flow_check.py:13-22).  imgs: uint8 BGR/RGB (H,W,3)."""
    gray1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    gray2 = cv2.cvtColor(img2, cv2.COLOR_BGR2GRAY)
    return cv2.calcOpticalFlowFarneback(
        gray1, gray2, None, pyr_scale=0.5, levels=3, winsize=15,
        iterations=3, poly_n=5, poly_sigma=1.2, flags=0)


@jax.jit
def flow_cosine_similarity(flow_a: jax.Array, flow_b: jax.Array) -> jax.Array:
    """Mean per-pixel cosine similarity between two flow fields
    (step4_flow_check.py:25-34), jitted."""
    a = flow_a.reshape(-1, 2)
    b = flow_b.reshape(-1, 2)
    dot = jnp.sum(a * b, axis=1)
    na = jnp.linalg.norm(a, axis=1) + 1e-6
    nb = jnp.linalg.norm(b, axis=1) + 1e-6
    return jnp.mean(dot / (na * nb))


def flow_gate_video(frames: List[np.ndarray], threshold: float = 0.5,
                    save_dir: Optional[str] = None) -> Tuple[List[float], List[int]]:
    """step4: consecutive-flow cosine gate; returns (similarities,
    indices flagged as abnormal motion) — sim < 0.5 flags
    (step4_flow_check.py:74-81)."""
    flows = []
    for i in range(len(frames) - 1):
        flow = farneback_flow(frames[i], frames[i + 1])
        flows.append(flow)
        if save_dir is not None:
            np.save(os.path.join(save_dir, f"flow_{i:03d}.npy"), flow)
    sims, flagged = [], []
    for i in range(len(flows) - 1):
        sim = float(flow_cosine_similarity(jnp.asarray(flows[i]),
                                           jnp.asarray(flows[i + 1])))
        sims.append(sim)
        if sim < threshold:
            flagged.append(i)
    return sims, flagged


def normalize_sample_names(train_root: str):
    """dataset_construction/main.py:7-16: rename every sample to
    sample_1.png within each frame folder."""
    for frame_folder in sorted(os.listdir(train_root)):
        fpath = os.path.join(train_root, frame_folder)
        if not os.path.isdir(fpath):
            continue
        for sample in os.listdir(fpath):
            ext = os.path.splitext(sample)[1]
            os.rename(os.path.join(fpath, sample),
                      os.path.join(fpath, f"sample_1{ext}"))
