"""Tracks->heatmaps in the decoupled training data path (VERDICT round 1,
Missing #6): FrameInterpolationDataset emits per-sample SIFT/PCHIP point
tracks rendered as Gaussian-heatmap videos, and the decoupled trainer's
frozen-ControlNet branch (train_decouples.py:740-743,956-976) consumes them
end-to-end on real folder data.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tvi.core.config import TINY_UNET


@pytest.fixture(scope="module")
def train_data_root(tmp_path_factory):
    """Tiny TrainData layout (frame_XX/sample_N.png) with a moving square
    so SIFT has texture to match."""
    import PIL.Image

    root = tmp_path_factory.mktemp("TrainData")
    rs = np.random.RandomState(0)
    n_frames, h, w = 6, 32, 32
    base = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    for f in range(n_frames):
        d = root / f"frame_{f:02d}"
        os.makedirs(d)
        for s in range(2):
            img = base.copy()
            x = 4 + 3 * f + 2 * s
            img[8:16, x:x + 8] = [255, 32, 32]
            PIL.Image.fromarray(img).save(d / f"sample_{s}.png")
    return str(root)


class TestDatasetTracks:
    def test_emits_tracks_and_heatmaps(self, train_data_root):
        from tvi.data.frame_dataset import FrameInterpolationDataset

        ds = FrameInterpolationDataset(
            train_data_root, width=32, height=32, sample_n_frames=4,
            with_point_tracks=True, num_tracks=3,
            cond_height=64, cond_width=64)
        item = ds.get_item(0, start=0)
        assert item["point_tracks"].shape == (4, 3, 2)
        assert item["controlnet_cond"].shape == (4, 64, 64, 3)
        assert item["controlnet_cond"].max() > 0  # heatmaps actually rendered
        # tracks stay inside the frame
        assert (item["point_tracks"] >= 0).all()
        assert (item["point_tracks"][..., 0] < 32).all()

    def test_batches_stack(self, train_data_root):
        from tvi.data.frame_dataset import FrameInterpolationDataset

        ds = FrameInterpolationDataset(
            train_data_root, width=32, height=32, sample_n_frames=4,
            with_point_tracks=True, num_tracks=3)
        batch = next(ds.batches(2))
        assert batch["controlnet_cond"].shape[0] == 2
        assert batch["point_tracks"].shape == (2, 4, 3, 2)

    def test_flat_images_fall_back_to_synthetic_tracks(self, tmp_path):
        import PIL.Image

        from tvi.data.frame_dataset import FrameInterpolationDataset

        for f in range(4):
            d = tmp_path / f"frame_{f:02d}"
            os.makedirs(d)
            PIL.Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(
                d / "sample_0.png")
        ds = FrameInterpolationDataset(
            str(tmp_path), width=16, height=16, sample_n_frames=4,
            with_point_tracks=True, num_tracks=2)
        item = ds.get_item(0, start=0)
        assert item["point_tracks"].shape == (4, 2, 2)


class TestDecoupledControlNetTraining:
    def test_cli_end_to_end_on_folder_data(self, train_data_root, tmp_path):
        """Two decoupled+ControlNet steps on real folder data through the
        full CLI (dataset -> SIFT tracks -> heatmaps -> frozen ControlNet ->
        train step), loss finite and logged."""
        import json

        from tvi.train.train_decoupled import main

        out = tmp_path / "out"
        main(["--tiny", "--data_root", train_data_root,
              "--output_dir", str(out), "--width", "32", "--height", "32",
              "--sample_n_frames", str(TINY_UNET.num_frames),
              "--per_gpu_batch_size", "1", "--max_train_steps", "2",
              "--with_controlnet", "--validation_steps", "0",
              "--checkpointing_steps", "100", "--topology", "acc_0"])
        metrics = [json.loads(line)
                   for line in open(out / "metrics.jsonl")]
        assert metrics and np.isfinite(metrics[-1]["loss"])
