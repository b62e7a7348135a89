"""Training datasets (host-side numpy iterators feeding the jitted steps).

``FrameInterpolationDataset`` reconstructs the missing src/data.py dataset
(SURVEY §2.4, interface from the ctor call at src/train.py:430-436): frame-
index-major ``TrainData/frame_XX/sample_NNN.png`` folders produced by
construct.folderize; a sample is one video = the same sample file across
``sample_n_frames`` consecutive frame folders.  Batches carry raw pixels in
[-1,1]; CLIP embeddings are computed inside the jitted train step (same math
the reference runs inside ``__getitem__`` with the passed encoder).

``WebVidStyleDataset`` reconstructs the subproject's missing
utils/dataset.py WebVid10M (SURVEY §2.4): per-video frame dirs + aligned
conditioning (depth) dirs + per-sample motion value, yielding the batch keys
train_svd.py consumes at :1113,1153,1191.

The decoupled variant adds single-channel motion maps (consumed by the
MotionEncoder, train_decouples.py:903-908); here they are |frame - first|
grayscale differences when no precomputed maps exist.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np

try:
    import PIL.Image

    def _load_image(path: str, width: int, height: int) -> np.ndarray:
        img = PIL.Image.open(path).convert("RGB")
        if img.size != (width, height):
            img = img.resize((width, height), PIL.Image.LANCZOS)
        return np.asarray(img, dtype=np.float32) / 255.0
except Exception:  # pragma: no cover
    _load_image = None


@dataclass
class FrameInterpolationDataset:
    root: str
    width: int = 512
    height: int = 320
    sample_n_frames: int = 14
    with_motion_maps: bool = False   # decoupled-trainer variant
    # decoupled trainer's ControlNet branch: emit per-sample point tracks
    # (SIFT first<->end, PCHIP over frames) rendered as the Gaussian-heatmap
    # conditioning video the reference builds from dataset tracks when
    # point tracks are on (train_decouples.py:915-918,956-976 with the
    # --no_point_tracks flag inverted; the dataset file itself is missing
    # from the snapshot — RECONSTRUCTED: straight-line fallback tracks when
    # SIFT finds no matches, so training never stalls on texture-poor pairs)
    with_point_tracks: bool = False
    num_tracks: int = 5
    # heatmap geometry: the ControlNet embedding downsamples 8x, so the
    # conditioning video must be 8x the latent grid (== pixel res for the
    # real 8x VAE; differs for thin test VAEs) — tracks are scaled to match
    cond_height: Optional[int] = None
    cond_width: Optional[int] = None
    seed: int = 0

    def __post_init__(self):
        frame_folders = sorted(
            d for d in os.listdir(self.root)
            if d.startswith("frame_") and os.path.isdir(os.path.join(self.root, d)))
        if len(frame_folders) < self.sample_n_frames:
            raise ValueError(
                f"need >= {self.sample_n_frames} frame folders under {self.root}, "
                f"found {len(frame_folders)}")
        self.frame_folders = frame_folders
        samples = set(os.listdir(os.path.join(self.root, frame_folders[0])))
        for d in frame_folders[1:]:
            samples &= set(os.listdir(os.path.join(self.root, d)))
        self.samples = sorted(samples)
        if not self.samples:
            raise ValueError(f"no sample present in every frame folder of {self.root}")
        self._rng = np.random.RandomState(self.seed)

    def __len__(self) -> int:
        return len(self.samples)

    def _load_video(self, sample: str, start: int) -> np.ndarray:
        frames = [
            _load_image(os.path.join(self.root, self.frame_folders[start + i], sample),
                        self.width, self.height)
            for i in range(self.sample_n_frames)
        ]
        return np.stack(frames)  # (F, H, W, 3) in [0,1]

    def get_item(self, index: int, start: Optional[int] = None) -> Dict[str, np.ndarray]:
        sample = self.samples[index % len(self.samples)]
        max_start = len(self.frame_folders) - self.sample_n_frames
        if start is None:
            start = int(self._rng.randint(0, max_start + 1)) if max_start > 0 else 0
        video01 = self._load_video(sample, start)
        video = video01 * 2.0 - 1.0
        item = {
            "video": video.astype(np.float32),
            "first": video[0].astype(np.float32),
            "end": video[-1].astype(np.float32),
        }
        if self.with_motion_maps:
            gray = video01.mean(axis=-1, keepdims=True)
            item["motion_first"] = np.abs(gray[1] - gray[0]).astype(np.float32)
            item["motion_end"] = np.abs(gray[-1] - gray[-2]).astype(np.float32)
        if self.with_point_tracks:
            tracks = self._point_tracks(video01)
            item["point_tracks"] = tracks
            from tvi.control.heatmap import render_heatmap_video

            ch = self.cond_height or self.height
            cw = self.cond_width or self.width
            scaled = tracks * np.asarray([cw / self.width, ch / self.height],
                                         np.float32)
            item["controlnet_cond"] = render_heatmap_video(
                scaled, cw, ch).astype(np.float32)
        return item

    def _point_tracks(self, video01: np.ndarray) -> np.ndarray:
        """(F, N, 2) tracks: SIFT matches first->end (app_org.py:389-414
        autopilot), PCHIP-interpolated; straight-line fallback."""
        from tvi.control.sift import sift_match
        from tvi.control.tracks import interpolate_trajectory

        f = video01.shape[0]
        first = (video01[0] * 255).astype(np.uint8)
        end = (video01[-1] * 255).astype(np.uint8)
        pts = sift_match(first, end, thr=0.5, topk=self.num_tracks,
                         method="random", rng=self._rng)
        if pts is None:  # texture-poor pair: synthetic straight lines
            start = np.stack([self._rng.uniform(0, self.width, self.num_tracks),
                              self._rng.uniform(0, self.height, self.num_tracks)],
                             axis=-1)
            drift = self._rng.uniform(-0.1, 0.1, (self.num_tracks, 2)) * \
                np.asarray([self.width, self.height])
            pts = np.stack([start, np.clip(start + drift, 0,
                                           [self.width - 1, self.height - 1])])
        n = pts.shape[1]
        tracks = interpolate_trajectory(pts, f)  # (F, n, 2)
        if n < self.num_tracks:  # pad by repeating so batches stack
            reps = np.tile(tracks[:, -1:], (1, self.num_tracks - n, 1))
            tracks = np.concatenate([tracks, reps], axis=1)
        return tracks[:, : self.num_tracks].astype(np.float32)

    def batches(self, batch_size: int, steps: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite (or ``steps``-bounded) shuffled batch iterator."""
        produced = 0
        order = self._rng.permutation(len(self.samples))
        cursor = 0
        while steps is None or produced < steps:
            idxs = []
            while len(idxs) < batch_size:
                if cursor >= len(order):
                    order = self._rng.permutation(len(self.samples))
                    cursor = 0
                idxs.append(int(order[cursor]))
                cursor += 1
            items = [self.get_item(i) for i in idxs]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
            produced += 1


@dataclass
class WebVidStyleDataset:
    """<root>/videos/<id>/*.png + <root>/conditioning/<id>/*.png +
    optional <root>/motion_values.txt ('<id> <value>' lines)."""

    root: str
    width: int = 512
    height: int = 512
    sample_n_frames: int = 14
    cond_scale: int = 8   # conditioning lives at pixel res (8x latent)
    seed: int = 0

    def __post_init__(self):
        vdir = os.path.join(self.root, "videos")
        self.video_ids = sorted(os.listdir(vdir))
        if not self.video_ids:
            raise ValueError(f"no videos under {vdir}")
        self.motion: Dict[str, float] = {}
        mpath = os.path.join(self.root, "motion_values.txt")
        if os.path.exists(mpath):
            for line in open(mpath):
                parts = line.split()
                if len(parts) == 2:
                    self.motion[parts[0]] = float(parts[1])
        self._rng = np.random.RandomState(self.seed)

    def __len__(self):
        return len(self.video_ids)

    def get_item(self, index: int) -> Dict[str, np.ndarray]:
        vid = self.video_ids[index % len(self.video_ids)]
        vdir = os.path.join(self.root, "videos", vid)
        cdir = os.path.join(self.root, "conditioning", vid)
        frames = sorted(os.listdir(vdir))[: self.sample_n_frames]
        video = np.stack([_load_image(os.path.join(vdir, f), self.width, self.height)
                          for f in frames])
        conds = np.stack([_load_image(os.path.join(cdir, f), self.width, self.height)
                          for f in frames]) if os.path.isdir(cdir) else np.zeros_like(video)
        return {
            "video": (video * 2 - 1).astype(np.float32),
            "controlnet_cond": conds.astype(np.float32),
            "motion_values": np.float32(self.motion.get(vid, 127.0)),
        }

    def batches(self, batch_size: int, steps: Optional[int] = None):
        produced = 0
        while steps is None or produced < steps:
            idxs = self._rng.randint(0, len(self.video_ids), size=batch_size)
            items = [self.get_item(int(i)) for i in idxs]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
            produced += 1
