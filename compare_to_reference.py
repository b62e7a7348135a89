"""SSIM fidelity harness vs the reference's committed output frames.

The driver gate is >=0.99 SSIM against reference frames (BASELINE.md).  The
reference snapshot ships one full generation under
/root/reference/outputs/: first_frame_*.png + last_frame_*.png inputs,
temp_{0,1}_<ts>/{0..13}.png output frames and temp_*_<ts>.npy point tracks
(shape (14, 1, 2)), produced by src/app_org.py Drag.run (512x320, 14
frames, 30 steps, fps 7 — app_org.py:370-476).

This CLI reruns that generation through the TPU pipeline and reports SSIM
per reference run.  It needs the real weights (offline in this container):
point --weights at a folder holding diffusers-style subfolders unet/ vae/
image_encoder/ [controlnet/] (stable-video-diffusion-img2vid-xt +
wwen1997/framer_512x320).  Without weights it exits rc=2 after validating
that every other ingredient (inputs, tracks, reference frames, SSIM
pipeline) is in place — so it runs the moment weights exist.

    python compare_to_reference.py --weights /path/to/weights \
        [--reference-dir /root/reference/outputs] [--out outputs/compare]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def find_reference_runs(ref_dir: str):
    """Yield (frames_dir, tracks_npy_or_None) for each temp_* run."""
    runs = []
    for d in sorted(glob.glob(os.path.join(ref_dir, "temp_*"))):
        if not os.path.isdir(d):
            continue
        npy = d + ".npy"
        runs.append((d, npy if os.path.exists(npy) else None))
    return runs


def load_inputs(ref_dir: str, width: int, height: int):
    import PIL.Image

    def load_one(pattern):
        files = sorted(glob.glob(os.path.join(ref_dir, pattern)))
        if not files:
            raise FileNotFoundError(f"no {pattern} under {ref_dir}")
        img = PIL.Image.open(files[0]).convert("RGB").resize((width, height))
        return np.asarray(img, np.float32)[None] / 255.0

    return load_one("first_frame_*.png"), load_one("last_frame_*.png")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default=os.environ.get("TVI_WEIGHTS", ""),
                   help="folder with unet/ vae/ image_encoder/ [controlnet/]")
    p.add_argument("--reference-dir", default="/root/reference/outputs")
    p.add_argument("--out", default="outputs/compare_to_reference")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion-bucket-id", type=int, default=100)
    p.add_argument("--controlnet-cond-scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    runs = find_reference_runs(args.reference_dir)
    first01, last01 = load_inputs(args.reference_dir, args.width, args.height)
    print(f"[compare] {len(runs)} reference runs, inputs "
          f"{first01.shape} in [{first01.min():.3f},{first01.max():.3f}]")
    if not runs:
        raise SystemExit(f"no temp_* runs under {args.reference_dir}")

    if not args.weights or not os.path.isdir(args.weights):
        print("[compare] no --weights folder available; the harness is armed "
              "but cannot generate (real SVD-xt/framer tensors are not "
              "downloadable in this offline container).  Exit 2.",
              file=sys.stderr)
        raise SystemExit(2)

    import jax

    from tvi.control.heatmap import render_heatmap_video
    from tvi.core.config import PipelineConfig
    from tvi.pipelines.factory import build_pipeline_from_hf
    from tvi.utils.metrics import compare_frame_dirs

    pipe = build_pipeline_from_hf(args.weights)
    os.makedirs(args.out, exist_ok=True)

    results = {}
    for frames_dir, npy in runs:
        name = os.path.basename(frames_dir)
        tracks = None
        heat = None
        if npy and pipe.controlnet is not None:
            tracks = np.asarray(np.load(npy), np.float32)  # (F, N, 2)
            ch, cw = pipe.controlnet_cond_size(args.height, args.width)
            heat = render_heatmap_video(tracks, cw, ch)[None] / 255.0
        cfg = PipelineConfig(
            height=args.height, width=args.width, num_frames=args.num_frames,
            num_inference_steps=args.steps, fps=args.fps,
            motion_bucket_id=args.motion_bucket_id,
            with_control=heat is not None,
            controlnet_cond_scale=args.controlnet_cond_scale)
        frames = pipe(first01, last01, jax.random.PRNGKey(args.seed),
                      config=cfg, controlnet_cond=heat,
                      point_tracks=tracks)
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        import PIL.Image
        for i in range(frames.shape[1]):
            PIL.Image.fromarray(frames[0, i]).save(
                os.path.join(out_dir, f"{i}.png"))
        results[name] = compare_frame_dirs(out_dir, frames_dir)
        print(f"[compare] {name}: {results[name]}")

    print(json.dumps(results))
    worst = min(r["ssim"] for r in results.values())
    print(f"[compare] worst-case SSIM = {worst:.4f} "
          f"({'PASS' if worst >= 0.99 else 'FAIL'} vs 0.99 gate)")


if __name__ == "__main__":
    main()
