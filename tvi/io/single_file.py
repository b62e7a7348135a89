"""Single-file (original LDM-layout) checkpoint loading.

TPU-native re-expression of the reference's vendored diffusers mixins
(`src/models/single_file.py`: FromSingleFileMixin:42, FromOriginalVAEMixin:289,
FromOriginalControlnetMixin:485).  Those mixins download a monolithic
`.ckpt`/`.safetensors` in the *original* CompVis/LDM key layout and convert
it to the diffusers layout before loading.  Here the same conversion is a
pure key/array transform feeding `tvi.io.hf_weights.state_dict_to_flax`:

    sd   = load_original_state_dict("v1-5.ckpt", extract_ema=True)
    vae  = convert_ldm_vae_state_dict(strip_prefix(sd, "first_stage_model."))
    tree = state_dict_to_flax(vae)

No torch at load time for .safetensors; `.ckpt` (a torch pickle) goes
through torch.load on CPU.

Scope notes (matching the reference's real usage):
  - FromOriginalControlnetMixin is the only mixin the reference *uses* (as a
    base of ControlNetSVDModel, controlnet_svd.py:116) and only standard
    SD-UNet-shaped checkpoints exist in the original layout; the SVD
    temporal blocks have no LDM-layout counterpart.  The converter therefore
    implements the standard SD ControlNet mapping, exactly like the vendored
    code it replaces.
  - The SVD VAE uses a *temporal* decoder; original-layout checkpoints only
    carry the standard KL decoder.  `load_vae_encoder_params_single_file`
    loads the encoder + quant_conv subset (everything shared), which is what
    an SVD pipeline can take from a single-file SD VAE.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from tvi.io.hf_weights import load_safetensors, state_dict_to_flax


# --------------------------------------------------------------- reading

def load_original_state_dict(path: str, extract_ema: bool = False
                             ) -> Dict[str, np.ndarray]:
    """Read a monolithic original checkpoint.

    .safetensors parses without torch; .ckpt/.pt/.bin are torch pickles.
    `state_dict` nesting is unwrapped.  With extract_ema=True, EMA shadow
    weights (`model_ema.<flattened-name>`, the CompVis convention where the
    flattened name is the model key after "model." with dots removed)
    replace their live counterparts — mirroring the mixins' extract_ema
    flag (reference single_file.py:95-97).
    """
    if path.endswith(".safetensors"):
        sd = load_safetensors(path)
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        sd = {k: v.float().numpy() for k, v in obj.items()
              if hasattr(v, "numpy")}
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    if extract_ema:
        ema = {k[len("model_ema."):]: v for k, v in sd.items()
               if k.startswith("model_ema.")}
        if ema:
            out = {}
            for k, v in sd.items():
                if k.startswith("model_ema."):
                    continue
                if k.startswith("model."):
                    flat = k[len("model."):].replace(".", "")
                    v = ema.get(flat, v)
                out[k] = v
            sd = out
    return {k: v for k, v in sd.items() if not k.startswith("model_ema.")}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select + strip one submodel's keys (e.g. 'first_stage_model.',
    'control_model.', 'model.diffusion_model.')."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ------------------------------------------------------------- VAE keys

def _conv_attn(arr: np.ndarray) -> np.ndarray:
    """LDM mid-attention q/k/v/proj_out are 1x1 convs (C, C, 1, 1); the
    diffusers Attention uses Linear (C, C)."""
    a = np.asarray(arr)
    return a.reshape(a.shape[0], a.shape[1]) if a.ndim == 4 else a


_VAE_ATTN = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
             "proj_out": "to_out.0"}


def convert_ldm_vae_state_dict(sd: Dict[str, np.ndarray]
                               ) -> Dict[str, np.ndarray]:
    """Original (CompVis) VAE layout -> diffusers AutoencoderKL layout.

    Key scheme translated (spec: the conversion the reference's
    FromOriginalVAEMixin performs via diffusers' convert_ldm_vae_checkpoint):
      encoder.down.{i}.block.{j}.*     -> encoder.down_blocks.{i}.resnets.{j}.*
      *.nin_shortcut                   -> *.conv_shortcut
      encoder.down.{i}.downsample.conv -> encoder.down_blocks.{i}.downsamplers.0.conv
      *.mid.block_{1,2}                -> *.mid_block.resnets.{0,1}
      *.mid.attn_1.{norm,q,k,v,proj_out} -> *.mid_block.attentions.0.{group_norm,
                                            to_q,to_k,to_v,to_out.0} (1x1 conv
                                            squeezed to Linear)
      *.norm_out                       -> *.conv_norm_out
      decoder.up.{i}                   -> decoder.up_blocks.{N-1-i}  (order
                                          reversed: LDM counts up from the
                                          bottleneck, diffusers from conv_in)
      decoder.up.{i}.upsample.conv     -> decoder.up_blocks.{N-1-i}.upsamplers.0.conv
      quant_conv / post_quant_conv     unchanged
    """
    n_up = 0
    for k in sd:
        m = re.match(r"decoder\.up\.(\d+)\.", k)
        if m:
            n_up = max(n_up, int(m.group(1)) + 1)

    out = {}
    for k, v in sd.items():
        nk = k
        m = re.match(r"(encoder|decoder)\.mid\.attn_1\.([a-z_]+)\.(weight|bias)",
                     nk)
        if m:
            side, leaf, wb = m.groups()
            v = _conv_attn(v) if wb == "weight" and leaf != "norm" else v
            out[f"{side}.mid_block.attentions.0.{_VAE_ATTN[leaf]}.{wb}"] = v
            continue
        nk = re.sub(r"\.mid\.block_([12])\b",
                    lambda m: f".mid_block.resnets.{int(m.group(1)) - 1}", nk)
        nk = re.sub(r"encoder\.down\.(\d+)\.block\.(\d+)",
                    r"encoder.down_blocks.\1.resnets.\2", nk)
        nk = re.sub(r"encoder\.down\.(\d+)\.downsample\.conv",
                    r"encoder.down_blocks.\1.downsamplers.0.conv", nk)
        nk = re.sub(r"decoder\.up\.(\d+)",
                    lambda m: f"decoder.up_blocks.{n_up - 1 - int(m.group(1))}",
                    nk)
        nk = re.sub(r"\.up_blocks\.(\d+)\.block\.(\d+)",
                    r".up_blocks.\1.resnets.\2", nk)
        nk = re.sub(r"\.up_blocks\.(\d+)\.upsample\.conv",
                    r".up_blocks.\1.upsamplers.0.conv", nk)
        nk = nk.replace(".nin_shortcut.", ".conv_shortcut.")
        nk = nk.replace(".norm_out.", ".conv_norm_out.")
        out[nk] = v
    return out


# ------------------------------------------------------- ControlNet keys

_RES_INNER = {
    "in_layers.0": "norm1", "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2", "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _res_inner(rest: str) -> str:
    for old, new in _RES_INNER.items():
        if rest.startswith(old + "."):
            return new + rest[len(old):]
    return rest


def convert_ldm_controlnet_state_dict(sd: Dict[str, np.ndarray],
                                      layers_per_block: int = 2
                                      ) -> Dict[str, np.ndarray]:
    """Original (SD/LDM UNet-style) ControlNet layout -> diffusers layout —
    the conversion behind the reference's FromOriginalControlnetMixin
    (single_file.py:485; base class of controlnet_svd.py:116).

      time_embed.{0,2}          -> time_embedding.linear_{1,2}
      input_blocks.0.0          -> conv_in
      input_blocks.{i}.0        -> down_blocks.{b}.resnets.{r} (SD inner-name
                                   map: in_layers/emb_layers/out_layers/
                                   skip_connection) or, at stage boundaries,
                                   .op -> down_blocks.{b}.downsamplers.0.conv
      input_blocks.{i}.1        -> down_blocks.{b}.attentions.{r}
      middle_block.{0,1,2}      -> mid_block.{resnets.0, attentions.0, resnets.1}
      zero_convs.{i}.0          -> controlnet_down_blocks.{i}
      middle_block_out.0        -> controlnet_mid_block
      input_hint_block.{2k}     -> controlnet_cond_embedding.{conv_in,
                                   blocks.0..5, conv_out}
    """
    per = layers_per_block + 1  # resnets per stage + downsampler slot
    out = {}
    for k, v in sd.items():
        m = re.match(r"time_embed\.(\d+)\.(.*)", k)
        if m:
            out[f"time_embedding.linear_{int(m.group(1)) // 2 + 1}.{m.group(2)}"] = v
            continue
        m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)", k)
        if m:
            i, slot, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            if i == 0:
                out[f"conv_in.{rest}"] = v
            elif i % per == 0 and slot == 0:
                # stage-boundary downsampler: input_blocks.{i}.0.op
                rest = rest[len("op."):] if rest.startswith("op.") else rest
                out[f"down_blocks.{i // per - 1}.downsamplers.0.conv.{rest}"] = v
            else:
                b, r = i // per, (i - 1) % per
                if slot == 0:
                    out[f"down_blocks.{b}.resnets.{r}.{_res_inner(rest)}"] = v
                else:
                    out[f"down_blocks.{b}.attentions.{r}.{rest}"] = v
            continue
        m = re.match(r"middle_block\.(\d+)\.(.*)", k)
        if m:
            slot, rest = int(m.group(1)), m.group(2)
            if slot == 1:
                out[f"mid_block.attentions.0.{rest}"] = v
            else:
                out[f"mid_block.resnets.{slot // 2}.{_res_inner(rest)}"] = v
            continue
        m = re.match(r"zero_convs\.(\d+)\.0\.(.*)", k)
        if m:
            out[f"controlnet_down_blocks.{m.group(1)}.{m.group(2)}"] = v
            continue
        m = re.match(r"middle_block_out\.0\.(.*)", k)
        if m:
            out[f"controlnet_mid_block.{m.group(1)}"] = v
            continue
        m = re.match(r"input_hint_block\.(\d+)\.(.*)", k)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            if idx % 2:  # odd slots are SiLU activations — no params
                continue
            n_conv = idx // 2
            if n_conv == 0:
                out[f"controlnet_cond_embedding.conv_in.{rest}"] = v
            elif n_conv == 7:
                out[f"controlnet_cond_embedding.conv_out.{rest}"] = v
            else:
                out[f"controlnet_cond_embedding.blocks.{n_conv - 1}.{rest}"] = v
            continue
        out[k] = v  # label_emb etc. pass through untranslated
    return out


# ------------------------------------------------------------ high level

def load_vae_encoder_params_single_file(path: str,
                                        extract_ema: bool = False,
                                        dtype=np.float32) -> dict:
    """Single-file checkpoint -> flax params for the VAE *encoder* subset
    (encoder + quant_conv) of AutoencoderKLTemporalDecoder.

    Accepts either a monolithic checkpoint (keys under 'first_stage_model.')
    or a bare VAE checkpoint in original layout.  The temporal decoder has
    no original-layout counterpart (see module docstring); standard-decoder
    keys in the file are ignored for this model.
    """
    sd = load_original_state_dict(path, extract_ema=extract_ema)
    sub = strip_prefix(sd, "first_stage_model.")
    if not sub:
        sub = sd
    conv = convert_ldm_vae_state_dict(sub)
    keep = {k: np.asarray(v, dtype=dtype) for k, v in conv.items()
            if k.startswith("encoder.") or k.startswith("quant_conv.")}
    if not keep:
        raise ValueError(
            f"{path}: no VAE encoder keys found (looked for "
            "'first_stage_model.encoder.*' or 'encoder.*')")
    return state_dict_to_flax(keep)
