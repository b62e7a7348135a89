"""Native C++ shard loader: build, correctness vs the shard contents,
threaded prefetch behavior."""

import os

import numpy as np
import pytest

from tvi.data.shards import (
    NativeFrameLoader,
    ensure_native_lib,
    pack_dataset,
    write_shard,
)

pytestmark = pytest.mark.skipif(
    ensure_native_lib() is None, reason="no g++ toolchain")


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rs = np.random.RandomState(0)
    vids = rs.randint(0, 256, size=(6, 4, 8, 8, 3), dtype=np.uint8)
    write_shard(str(d / "shard_0000.tvis"), vids[:4])
    write_shard(str(d / "shard_0001.tvis"), vids[4:])
    return d, vids


class TestNativeLoader:
    def test_metadata_and_normalization(self, shard_dir):
        d, vids = shard_dir
        loader = NativeFrameLoader(
            [str(d / "shard_0000.tvis"), str(d / "shard_0001.tvis")],
            batch_size=3, seed=7)
        try:
            assert loader.num_records == 6
            assert (loader.frames, loader.height, loader.width) == (4, 8, 8)
            batch = loader.next()
            assert batch["video"].shape == (3, 4, 8, 8, 3)
            assert batch["video"].dtype == np.float32
            assert batch["video"].min() >= -1.0 and batch["video"].max() <= 1.0
            np.testing.assert_allclose(batch["first"], batch["video"][:, 0])
            # every served record must be one of the shard records, exactly
            # normalized: uint8/255*2-1
            expected = vids.astype(np.float32) / 255.0 * 2.0 - 1.0
            for b in range(3):
                diffs = [np.abs(batch["video"][b] - e).max() for e in expected]
                assert min(diffs) < 1e-6
        finally:
            loader.close()

    def test_many_batches_prefetched(self, shard_dir):
        d, _ = shard_dir
        loader = NativeFrameLoader([str(d / "shard_0000.tvis")], batch_size=2,
                                   prefetch=3, n_threads=3, seed=1)
        try:
            seen = [loader.next()["video"].sum() for _ in range(20)]
            assert len(set(np.round(seen, 3))) > 1  # sampling varies
        finally:
            loader.close()

    def test_bad_shard_rejected(self, tmp_path):
        p = tmp_path / "bad.tvis"
        p.write_bytes(b"NOPE" + b"\x00" * 64)
        with pytest.raises(RuntimeError):
            NativeFrameLoader([str(p)], batch_size=1)


class TestPackDataset:
    def test_pack_from_frame_dataset(self, tmp_path):
        import PIL.Image

        from tvi.data.frame_dataset import FrameInterpolationDataset

        root = tmp_path / "TrainData"
        for f in range(4):
            d = root / f"frame_{f:02d}"
            d.mkdir(parents=True)
            for s in range(2):
                arr = np.full((8, 8, 3), 30 * f + 10 * s, np.uint8)
                PIL.Image.fromarray(arr).save(d / f"sample_{s:03d}.png")
        ds = FrameInterpolationDataset(str(root), width=8, height=8,
                                       sample_n_frames=4)
        paths = pack_dataset(ds, str(tmp_path / "shards"), records_per_shard=1)
        assert len(paths) == 2
        loader = NativeFrameLoader(paths, batch_size=2, seed=0)
        try:
            batch = loader.next()
            assert batch["video"].shape == (2, 4, 8, 8, 3)
        finally:
            loader.close()
