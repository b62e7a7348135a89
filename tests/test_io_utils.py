"""Coverage for io (pipeline export/load), image utils, topologies, and
the synthetic-batch plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.io.orbax_ckpt import export_pipeline_params, load_pipeline_params
from tvi.parallel.mesh import MeshSpec, create_mesh
from tvi.parallel.topologies import PRESETS, get_mesh_spec
from tvi.utils.images import postprocess_frames, save_gif, to_vae_range


class TestPipelineParamsIO:
    def test_export_load_roundtrip(self, tmp_path):
        params = {
            "unet": {"params": {"conv_in": {"kernel": np.ones((3, 3, 9, 8), np.float32)}}},
            "vae": {"params": {"x": np.arange(4.0, dtype=np.float32)}},
            "clip": {"params": {"y": np.zeros((2, 2), np.float32)}},
            "mask_token": np.asarray([1, 2, 3, 4], np.float32),
        }
        export_pipeline_params(str(tmp_path / "pipeline"), params)
        loaded = load_pipeline_params(str(tmp_path))
        np.testing.assert_array_equal(loaded["mask_token"], params["mask_token"])
        np.testing.assert_array_equal(
            loaded["unet"]["params"]["conv_in"]["kernel"],
            params["unet"]["params"]["conv_in"]["kernel"])

    def test_load_missing_is_clear(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="pipeline_params"):
            load_pipeline_params(str(tmp_path))

    def test_load_rejects_wrong_tree(self, tmp_path):
        from flax import serialization

        (tmp_path / "pipeline_params.msgpack").write_bytes(
            serialization.msgpack_serialize({"step": np.zeros(1)}))
        with pytest.raises(ValueError, match="does not hold exported"):
            load_pipeline_params(str(tmp_path))


class TestTopologies:
    def test_every_preset_resolves_on_8_devices(self):
        for name in PRESETS:
            spec = get_mesh_spec(name)
            data, model = spec.resolve(8)
            assert data * model <= 8, name

    def test_mesh_axes(self):
        mesh = create_mesh(get_mesh_spec("v5e-8-sp2"))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_unknown_preset(self):
        with pytest.raises(KeyError, match="unknown topology"):
            get_mesh_spec("nope")


class TestImageUtils:
    def test_vae_range_and_postprocess_roundtrip(self):
        u8 = np.arange(0, 256, 51, dtype=np.uint8).reshape(1, 1, 6, 1)
        u8 = np.repeat(u8, 3, axis=-1)
        m11 = to_vae_range(u8.astype(np.float32) / 255.0)
        back = postprocess_frames(m11)
        np.testing.assert_array_equal(back, u8)

    def test_save_gif(self, tmp_path):
        frames = np.random.RandomState(0).randint(
            0, 255, (3, 8, 8, 3), np.uint8)
        path = str(tmp_path / "x.gif")
        save_gif(frames, path)
        assert os.path.getsize(path) > 0


class TestSyntheticBatches:
    def test_motion_map_keys(self):
        from tvi.train.train_interp import synthetic_batches

        gen = synthetic_batches(np.random.RandomState(0), 2, 4, 8, 8,
                                with_motion=True)
        b = next(gen)
        assert set(b) == {"video", "first", "end", "motion_first", "motion_end"}
        assert b["motion_first"].shape == (2, 8, 8, 1)
        assert b["video"].min() >= -1.0 and b["video"].max() <= 1.0
