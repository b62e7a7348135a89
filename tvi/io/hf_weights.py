"""HF/torch checkpoint -> flax pytree conversion.

Lets a user of the reference bring their existing weights
(stable-video-diffusion-img2vid-xt, wwen1997/framer_512x320 subfolders
unet/ + controlnet/, CLIP ViT-H) into this framework:

  - name translation from diffusers/transformers state_dict keys to this
    repo's flax module paths,
  - layout conversion (Linear (O,I)->(I,O); Conv2d (O,I,kh,kw)->(kh,kw,I,O);
    Conv3d (O,I,kt,kh,kw)->(kt,kh,kw,I,O); norms weight->scale),
  - the fork's 8->9 conv_in surgery + mask_token init (reference
    unet_spatio_temporal_condition.py:781-791: the 9th input channel of
    conv_in is randn-initialized, the first 8 copied; mask_token is
    randn(1,1,4,1,1), stored here as shape (4,)).

Reads .safetensors directly (pure-python header parse — no torch needed)
or torch .bin via torch.load when torch is available.
"""

from __future__ import annotations

import json
import os
import re
import struct
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import traverse_util

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None,  # bf16 special-cased
    "F64": np.float64, "I64": np.int64, "I32": np.int32, "U8": np.uint8,
    "BOOL": np.bool_,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (format: u64 header-len, JSON header with
    dtype/shape/data_offsets per tensor, raw buffer)."""
    import jax.numpy as jnp

    with open(path, "rb") as fh:
        (hlen,) = struct.unpack("<Q", fh.read(8))
        header = json.loads(fh.read(hlen))
        buf = fh.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = buf[start:end]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = np.asarray(jnp.asarray(u16).view(jnp.bfloat16).astype(jnp.float32))
        else:
            arr = np.frombuffer(raw, dtype=_DTYPES[meta["dtype"]]).copy()
        out[name] = arr.reshape(meta["shape"])
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


# ------------------------------------------------------------------ naming

_INDEXED = (
    "down_blocks", "up_blocks", "resnets", "attentions", "transformer_blocks",
    "temporal_transformer_blocks", "downsamplers", "upsamplers", "layers",
    "blocks", "controlnet_down_blocks",
)


def translate_torch_key(key: str) -> Tuple[str, str]:
    """diffusers/transformers dotted name -> (flax '/'-path, kind).

    kind in {'linear', 'conv', 'norm', 'raw'} drives the layout transform.
    """
    k = key
    # transformers CLIP prefixes
    k = k.replace("vision_model.embeddings.", "")
    k = k.replace("vision_model.encoder.", "")
    k = k.replace("vision_model.", "")
    k = k.replace("self_attn.", "")
    k = k.replace("mlp.", "")
    # collapse indexed module lists: name.3 -> name_3
    for mod in _INDEXED:
        k = re.sub(rf"\b{mod}\.(\d+)", rf"{mod}_\1", k)
    # diffusers FeedForward GEGLU: ff.net.0.proj -> ff/proj_geglu, ff.net.2 -> ff/proj_out
    k = k.replace(".net.0.proj", ".proj_geglu").replace(".net.2", ".proj_out")
    # attention out projection: to_out.0 -> to_out
    k = k.replace("to_out.0", "to_out")
    # nn.Embedding tables are stored transposition-free under the bare name
    if k.endswith("position_embedding.weight"):
        return k[: -len(".weight")].replace(".", "/"), "raw"
    # Down/Upsample2D inner conv: kept as <name>/conv in our modules
    parts = k.split(".")
    leaf = parts[-1]
    path = "/".join(parts[:-1])

    norm_markers = ("norm", "layer_norm", "layernorm", "pre_layrnorm",
                    "post_layernorm", "group_norm")
    is_norm = any(m in parts[-2] for m in norm_markers) if len(parts) >= 2 else False

    if leaf == "weight":
        if is_norm:
            return f"{path}/scale", "norm"
        return f"{path}/kernel", "linear_or_conv"
    if leaf == "bias":
        return f"{path}/bias", "raw"
    # bare parameters: mask_token, mix_factor, class/position embeddings
    return k.replace(".", "/"), "raw"


def convert_tensor(name: str, arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear_or_conv":
        if arr.ndim == 2:       # Linear (O, I) -> (I, O)
            return arr.T
        if arr.ndim == 4:       # Conv2d (O, I, kh, kw) -> (kh, kw, I, O)
            return arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:       # Conv3d (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
            return arr.transpose(2, 3, 4, 1, 0)
    return arr


def state_dict_to_flax(sd: Dict[str, np.ndarray],
                       prefix: str = "params") -> dict:
    """Full conversion: returns a flax variables dict {'params': {...}}."""
    flat = {}
    for key, arr in sd.items():
        path, kind = translate_torch_key(key)
        flat[f"{prefix}/{path}"] = convert_tensor(key, arr, kind)
    return traverse_util.unflatten_dict(flat, sep="/")


def apply_interp_surgery(sd: Dict[str, np.ndarray],
                         rng: Optional[np.random.RandomState] = None
                         ) -> Dict[str, np.ndarray]:
    """The fork's 8->9 channel surgery on a stock SVD state dict
    (reference :781-791): extend conv_in.weight with a randn 9th input
    channel and add a randn mask_token."""
    rng = rng or np.random.RandomState(0)
    sd = dict(sd)
    w = sd["conv_in.weight"]
    if w.shape[1] == 8:
        new = rng.randn(w.shape[0], 9, *w.shape[2:]).astype(w.dtype)
        new[:, :8] = w
        sd["conv_in.weight"] = new
    if "mask_token" not in sd:
        sd["mask_token"] = rng.randn(1, 1, 4, 1, 1).astype(w.dtype)
    return sd


def extract_mask_token(sd: Dict[str, np.ndarray]) -> Optional[np.ndarray]:
    """The fork stores mask_token as (1,1,4,1,1); this framework uses (4,)."""
    if "mask_token" in sd:
        return np.asarray(sd["mask_token"]).reshape(-1)
    return None


def load_unet_params(path_or_sd, dtype=np.float32,
                     with_surgery: bool = False) -> Tuple[dict, Optional[np.ndarray]]:
    """Load a diffusers SVD UNet checkpoint file (or pre-loaded dict) into
    (flax variables, mask_token)."""
    sd = load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)
    if with_surgery:
        sd = apply_interp_surgery(sd)
    mask_token = extract_mask_token(sd)
    sd.pop("mask_token", None)
    sd = {k: np.asarray(v, dtype=dtype) for k, v in sd.items()}
    return state_dict_to_flax(sd), mask_token


# ------------------------------------------------------- inverse (testing)

def flax_to_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip testing without real checkpoints):
    produces a torch-style state dict from this repo's param tree."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    out = {}
    for path, arr in flat.items():
        parts = path.split("/")
        if parts[0] == "params":
            parts = parts[1:]
        leaf = parts[-1]
        body = ".".join(parts[:-1])
        # undo indexed-name collapse
        for mod in _INDEXED:
            body = re.sub(rf"\b{mod}_(\d+)", rf"{mod}.\1", body)
        body = body.replace(".proj_geglu", ".net.0.proj").replace(".proj_out", ".net.2") \
            if ".ff" in body or body.endswith("proj_geglu") else body
        arr = np.asarray(arr)
        if leaf == "kernel":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 5:
                arr = arr.transpose(4, 3, 0, 1, 2)
            name = f"{body}.weight"
        elif leaf == "scale":
            name = f"{body}.weight"
        elif leaf == "bias":
            name = f"{body}.bias"
        else:
            name = f"{body}.{leaf}" if body else leaf
        if body.endswith("to_out") and leaf in ("kernel", "bias"):
            name = name.replace("to_out.", "to_out.0.")
        out[name] = arr
    return out
