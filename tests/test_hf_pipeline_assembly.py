"""End-to-end checkpoint-files -> pipeline -> frames assembly test.

Synthesizes tiny-scale safetensors checkpoints with the exact torch
key/shape structure of the real releases (tests/torch_manifests.py at thin
widths), writes them in HF layout (unet/ vae/ image_encoder/ controlnet/),
and drives tvi.pipelines.factory.build_pipeline_from_hf through a full
2-step generation — the same path compare_to_reference.py takes the moment
real weights exist.
"""

from __future__ import annotations

import json
import os
import struct

import jax
import numpy as np
import pytest

from tests.torch_manifests import (
    clip_vit_h_manifest,
    controlnet_svd_manifest,
    svd_unet_manifest,
    svd_vae_manifest,
)
from tvi.core.config import TINY_CLIP, TINY_UNET, TINY_VAE, PipelineConfig


def write_safetensors(path: str, sd: dict) -> None:
    """Minimal safetensors writer (inverse of tvi.io.hf_weights reader)."""
    header = {}
    offset = 0
    payload = []
    for name, arr in sd.items():
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        nbytes = arr.nbytes
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [offset, offset + nbytes]}
        payload.append(arr.tobytes())
        offset += nbytes
    hjson = json.dumps(header).encode()
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(hjson)))
        fh.write(hjson)
        fh.write(b"".join(payload))


def _random_sd(manifest: dict, rng: np.random.RandomState) -> dict:
    return {k: rng.randn(*s).astype(np.float32) * 0.02
            for k, s in manifest.items()}


@pytest.fixture(scope="module")
def weights_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hf_weights")
    rng = np.random.RandomState(0)
    u = TINY_UNET
    # the released SVD-xt checkpoint is 8-channel, no mask_token: the
    # assembly must apply the fork's surgery on load
    unet_sd = _random_sd(svd_unet_manifest(
        in_channels=8, block_out_channels=u.block_out_channels,
        layers_per_block=u.layers_per_block,
        cross_attention_dim=u.cross_attention_dim,
        addition_time_embed_dim=u.addition_time_embed_dim,
        projection_dim=u.projection_class_embeddings_input_dim), rng)
    vae_sd = _random_sd(svd_vae_manifest(
        block_out_channels=TINY_VAE.block_out_channels,
        layers_per_block=TINY_VAE.layers_per_block), rng)
    clip_sd = _random_sd(clip_vit_h_manifest(
        hidden=TINY_CLIP.hidden_size, layers=TINY_CLIP.num_layers,
        intermediate=TINY_CLIP.intermediate_size, patch=TINY_CLIP.patch_size,
        image_size=TINY_CLIP.image_size,
        projection_dim=u.cross_attention_dim), rng)
    cn_sd = _random_sd(controlnet_svd_manifest(
        in_channels=9, block_out_channels=u.block_out_channels,
        layers_per_block=u.layers_per_block,
        cross_attention_dim=u.cross_attention_dim,
        projection_dim=u.projection_class_embeddings_input_dim), rng)
    for sub, sd in (("unet", unet_sd), ("vae", vae_sd),
                    ("image_encoder", clip_sd), ("controlnet", cn_sd)):
        os.makedirs(root / sub)
        write_safetensors(str(root / sub / "model.safetensors"), sd)
    return root


def test_assembles_and_generates(weights_root):
    from tvi.pipelines.factory import build_pipeline_from_hf

    tiny_clip = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)
    pipe = build_pipeline_from_hf(
        str(weights_root), dtype=jax.numpy.float32,
        unet_config=TINY_UNET, vae_config=TINY_VAE, clip_config=tiny_clip)
    assert pipe.controlnet is not None
    assert pipe.mask_token.shape == (4,)

    f = TINY_UNET.num_frames
    cfg = PipelineConfig(height=16, width=16, num_frames=f,
                         num_inference_steps=2, decode_chunk_size=None)
    img = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
    frames = pipe(img, img[:, ::-1], jax.random.PRNGKey(0), config=cfg)
    assert frames.shape == (1, f, 16, 16, 3)
    assert frames.dtype == np.uint8


def test_reader_roundtrips_writer(weights_root, tmp_path):
    from tvi.io.hf_weights import load_safetensors

    rng = np.random.RandomState(3)
    sd = {"a.weight": rng.randn(4, 3).astype(np.float32),
          "b.bias": rng.randn(7).astype(np.float32)}
    path = str(tmp_path / "t.safetensors")
    write_safetensors(path, sd)
    back = load_safetensors(path)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
