"""Depth-ControlNet SVD img2vid inference — parity with
svd-temporal-controlnet/run_inference.py:255-289 (the vendored
sub-project): one conditioning image + a depth-video folder -> 14 frames,
side-by-side GIF of conditioning vs generation (run_inference.py:12-65).

    python -m tvi.apps.run_inference --image img.png --cond_dir depth_frames/ \
        --output_dir outputs/svd_cn [--tiny --steps 2]

Runs the sub-project's TRUE conditioning layout: an 8-channel UNet input
(noise-augmented first-frame latent repeated over F frames channel-concat
with the noisy latents, train_svd.py:1132-1190), a single CLIP token, no
mask token — selected via PipelineConfig(conditioning_mode='first_frame');
the depth video rides the ControlNet branch.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from tvi.core.config import PipelineConfig
from tvi.utils.images import pil_to_array, save_gif


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--cond_dir", required=True, help="depth/conditioning frames dir")
    p.add_argument("--output_dir", default="outputs/svd_cn")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--motion_bucket_id", type=int, default=10)
    p.add_argument("--controlnet_cond_scale", type=float, default=1.0)
    p.add_argument("--decode_chunk_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import PIL.Image

    from tvi.pipelines.factory import build_pipeline, build_tiny_pipeline

    from tvi.core.config import TINY_UNET, UNetConfig

    rng = jax.random.PRNGKey(args.seed)
    # the sub-project UNet is the stock 8-channel SVD denoiser (no mask
    # channel/token, train_svd.py:797-800)
    if args.tiny:
        pipe = build_tiny_pipeline(
            rng, with_controlnet=True,
            unet_config=TINY_UNET.replace(in_channels=8, use_mask_token=False))
    else:
        params = None
        if args.model:
            from tvi.io.orbax_ckpt import CheckpointManager

            _, params = CheckpointManager(args.model).restore_latest()
        pipe = build_pipeline(
            rng, with_controlnet=True, params=params,
            unet_config=UNetConfig(in_channels=8, use_mask_token=False))

    os.makedirs(args.output_dir, exist_ok=True)
    img = pil_to_array(PIL.Image.open(args.image), args.height, args.width)

    # frame-number-sorted conditioning frames (run_inference.py:149-225)
    def frame_number(name: str):
        parts = os.path.splitext(name)[0].split("_")
        try:
            return int(parts[-1])
        except ValueError:
            return 1 << 30

    cond_files = sorted(
        (f for f in os.listdir(args.cond_dir)
         if f.lower().endswith((".png", ".jpg", ".jpeg"))), key=frame_number)
    if not cond_files:
        raise SystemExit(f"[run_inference] no image files in {args.cond_dir}")
    cond_files = cond_files[: args.num_frames]
    if len(cond_files) < args.num_frames:
        cond_files += [cond_files[-1]] * (args.num_frames - len(cond_files))
    ch, cw = pipe.controlnet_cond_size(args.height, args.width)
    cond = np.concatenate([
        pil_to_array(PIL.Image.open(os.path.join(args.cond_dir, f)), ch, cw)
        for f in cond_files])[None]                       # (1, F, Hc, Wc, 3)

    cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.steps, motion_bucket_id=args.motion_bucket_id,
        decode_chunk_size=args.decode_chunk_size, with_control=True,
        conditioning_mode="first_frame",
        controlnet_cond_scale=args.controlnet_cond_scale)

    frames = pipe(img, None, jax.random.PRNGKey(args.seed), cfg,
                  controlnet_cond=cond)
    gen = frames[0]
    cond_u8 = (cond[0] * 255).astype(np.uint8)
    if cond_u8.shape[1:3] != gen.shape[1:3]:
        cond_u8 = np.stack([
            np.asarray(PIL.Image.fromarray(c).resize(
                (gen.shape[2], gen.shape[1]))) for c in cond_u8])
    side_by_side = np.concatenate([cond_u8, gen], axis=2)  # (F, H, 2W, 3)
    for i, f in enumerate(gen):
        PIL.Image.fromarray(f).save(os.path.join(args.output_dir, f"frame_{i:02d}.png"))
    save_gif(side_by_side, os.path.join(args.output_dir, "side_by_side.gif"))
    print(f"[run_inference] wrote {len(gen)} frames + side_by_side.gif to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()
