"""Dataset-construction pipeline tests (steps 1-4)."""

import os

import numpy as np
import pytest

from tvi.data.construct import (
    HAVE_CV2,
    flow_cosine_similarity,
    flow_gate_video,
    folderize,
    normalize_sample_names,
    unfolderize,
)


def _write_video_frames(d, n=25, size=16, seed=0):
    import PIL.Image

    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(seed)
    base = rs.randint(0, 255, (size, size, 3), np.uint8)
    for i in range(n):
        arr = np.roll(base, i, axis=1)  # steady horizontal motion
        PIL.Image.fromarray(arr).save(os.path.join(d, f"frame_{i:04d}.jpg"))


class TestFolderize:
    def test_step2_and_step3_roundtrip(self, tmp_path):
        split = tmp_path / "split"
        _write_video_frames(split / "vidA", n=25)
        _write_video_frames(split / "vidB", n=25, seed=1)
        train = tmp_path / "TrainData"
        n_folders = folderize(str(split), str(train), gap=10, max_frames=2)
        assert n_folders == 2
        assert sorted(os.listdir(train)) == ["frame_00", "frame_01"]
        assert sorted(os.listdir(train / "frame_00")) == [
            "sample_000.png", "sample_001.png"]
        seq = tmp_path / "Seq"
        unfolderize(str(train), str(seq))
        assert sorted(os.listdir(seq)) == ["sample_000", "sample_001"]
        assert sorted(os.listdir(seq / "sample_000")) == [
            "frame_00.png", "frame_01.png"]

    def test_normalize_sample_names(self, tmp_path):
        train = tmp_path / "TrainData"
        (train / "frame_00").mkdir(parents=True)
        (train / "frame_00" / "sample_007.png").write_bytes(b"x")
        normalize_sample_names(str(train))
        assert os.listdir(train / "frame_00") == ["sample_1.png"]


class TestFlowGate:
    def test_cosine_similarity_math(self):
        a = np.ones((4, 4, 2), np.float32)
        assert float(flow_cosine_similarity(a, a)) == pytest.approx(1.0, abs=1e-4)
        assert float(flow_cosine_similarity(a, -a)) == pytest.approx(-1.0, abs=1e-4)
        b = np.stack([np.ones((4, 4)), np.zeros((4, 4))], -1).astype(np.float32)
        c = np.stack([np.zeros((4, 4)), np.ones((4, 4))], -1).astype(np.float32)
        assert abs(float(flow_cosine_similarity(b, c))) < 1e-3

    @pytest.mark.skipif(not HAVE_CV2, reason="no OpenCV")
    def test_steady_motion_not_flagged(self):
        rs = np.random.RandomState(0)
        base = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        frames = [np.roll(base, 2 * i, axis=1) for i in range(5)]
        sims, flagged = flow_gate_video(frames, threshold=0.5)
        assert len(sims) == 3
        assert flagged == [], sims

    @pytest.mark.skipif(not HAVE_CV2, reason="no OpenCV")
    def test_reversing_motion_flagged(self):
        rs = np.random.RandomState(0)
        base = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        # right, right, hard reverse, reverse
        frames = [np.roll(base, s, axis=1) for s in [0, 4, 8, 4, 0]]
        sims, flagged = flow_gate_video(frames, threshold=0.5)
        assert any(s < 0.5 for s in sims), sims
        assert flagged
