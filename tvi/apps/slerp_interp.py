"""Latent-SLERP keyframe interpolation — reconstruction of the 0-byte
``frame_slerp_interp.py`` per the driver spec (BASELINE.json config 1):
VAE-encode 2 keyframes, SLERP 8 intermediate latents, decode at 256x256.

    python -m tvi.apps.slerp_interp --image_0 a.png --image_1 b.png \
        --output_dir outputs/slerp [--num_intermediate 8] [--size 256]

The whole program (encode -> slerp -> chunked temporal decode) is one jitted
function.  ``--tiny`` uses the thin test VAE (random weights) for smoke runs.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from tvi.core.config import TINY_VAE, VAEConfig
from tvi.models.vae import AutoencoderKLTemporalDecoder
from tvi.ops.slerp import slerp
from tvi.utils.images import postprocess_frames, save_gif, to_vae_range


def build_slerp_fn(vae: AutoencoderKLTemporalDecoder, num_intermediate: int):
    """Returns jitted fn(vae_params, img0_m11, img1_m11) -> (F, H, W, 3)
    decoded frames in [-1,1], F = num_intermediate + 2 (endpoints kept)."""

    @jax.jit
    def run(vae_params, img0, img1):
        z = vae.apply(vae_params, jnp.stack([img0, img1]), method=vae.encode_mode)
        ts = jnp.linspace(0.0, 1.0, num_intermediate + 2)
        lat = slerp(ts, z[0], z[1])                      # (F, h, w, 4)
        return vae.apply(vae_params, lat, lat.shape[0], method=vae.decode)

    return run


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_0", required=True)
    p.add_argument("--image_1", required=True)
    p.add_argument("--output_dir", default="outputs/slerp")
    p.add_argument("--num_intermediate", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import PIL.Image

    from tvi.utils.images import pil_to_array

    os.makedirs(args.output_dir, exist_ok=True)
    img0 = pil_to_array(PIL.Image.open(args.image_0), args.size, args.size)[0]
    img1 = pil_to_array(PIL.Image.open(args.image_1), args.size, args.size)[0]

    vae_cfg = TINY_VAE if args.tiny else VAEConfig()
    vae = AutoencoderKLTemporalDecoder(vae_cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init(rng, jnp.zeros((1, 32, 32, 3)), 1)
    # NOTE: random weights unless a checkpoint is supplied via TVI_VAE_CKPT
    ckpt_dir = os.environ.get("TVI_VAE_CKPT")
    if ckpt_dir:
        from tvi.io.orbax_ckpt import CheckpointManager

        _, vae_params = CheckpointManager(ckpt_dir).restore_latest(
            jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), vae_params))

    run = build_slerp_fn(vae, args.num_intermediate)
    frames = run(vae_params, jnp.asarray(to_vae_range(img0)),
                 jnp.asarray(to_vae_range(img1)))
    frames_u8 = postprocess_frames(np.asarray(frames))
    for i, f in enumerate(frames_u8):
        PIL.Image.fromarray(f).save(os.path.join(args.output_dir, f"frame_{i:02d}.png"))
    save_gif(frames_u8, os.path.join(args.output_dir, "slerp.gif"))
    print(f"[slerp_interp] wrote {len(frames_u8)} frames to {args.output_dir}")


if __name__ == "__main__":
    main()
