"""Batch eval CLI — parity with src/test.py:45-666.

Iterates ``--assets`` folders (each with input_frames/image_0.png,
image_1.png, optional track.txt), runs the interpolation pipeline with the
full ablation-flag surface, saves per-frame PNGs + GIF per folder
(test.py:619-623), and optionally dumps attention-statistics CSVs
(unet_cross_anal.csv: frame_idx,FirstFrame_sim,EndFrame_sim;
unet_cross_anal_total.csv: module_name,FirstFrame_sim,EndFrame_sim —
schema from src/test.py:361-403).

    python -m tvi.apps.test_sweep --assets ./assets --output_dir Result/run \
        [--with_no_track] [--without_end_embedding] ... [--tiny --steps 2]

    CPU note: pass a small geometry with --tiny (e.g. --height 64 --width 64
    --num_frames 3).  On CPU the flash kernels are ineligible and the XLA
    fallback materializes full attention logits; the default 512x320
    geometry exhausts host memory.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import numpy as np

from tvi.core.config import PipelineConfig
from tvi.control.heatmap import render_heatmap_video
from tvi.control.tracks import load_track_file
from tvi.pipelines.conditioning import CondAblations
from tvi.utils.images import pil_to_array, save_gif


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--assets", default="./assets")
    p.add_argument("--output_dir", default="Result/run")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--motion_bucket_id", type=int, default=100)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--controlnet_cond_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    # ablation flags, names 1:1 with src/test.py:628-666
    p.add_argument("--with_no_track", action="store_true")
    p.add_argument("--without_controlnet", action="store_true")
    p.add_argument("--without_front_embedding", action="store_true")
    p.add_argument("--without_end_embedding", action="store_true")
    p.add_argument("--without_front_channel", action="store_true")
    p.add_argument("--without_end_channel", action="store_true")
    p.add_argument("--seoncd_channel_firstframe_condition", action="store_true")
    p.add_argument("--last_channel_lastframe_condition", action="store_true")
    p.add_argument("--channelwise_all_front", action="store_true")
    p.add_argument("--channelwise_all_end", action="store_true")
    p.add_argument("--use_attentionmask", action="store_true")
    p.add_argument("--controlnet_attentioncontrol", action="store_true",
                   help="dump attention-statistics CSVs")
    p.add_argument("--do_motion_prompt", action="store_true")
    p.add_argument("--use_projector", action="store_true")
    p.add_argument("--model", type=str, default=None,
                   help="checkpoint directory (random init when omitted)")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def write_attn_csvs(records, out_dir: str):
    """records: list (per step) of {module: (first (F,), end (F,))}."""
    by_frame_first, by_frame_end = {}, {}
    by_module = {}
    for rec in records:
        for module, (first, end) in rec.items():
            for f in range(len(first)):
                by_frame_first.setdefault(f, []).append(float(first[f]))
                by_frame_end.setdefault(f, []).append(float(end[f]))
            m = by_module.setdefault(module, ([], []))
            m[0].append(float(np.mean(first)))
            m[1].append(float(np.mean(end)))
    with open(os.path.join(out_dir, "unet_cross_anal.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["frame_idx", "FirstFrame_sim", "EndFrame_sim"])
        for f in sorted(by_frame_first):
            w.writerow([f, np.mean(by_frame_first[f]), np.mean(by_frame_end[f])])
    with open(os.path.join(out_dir, "unet_cross_anal_total.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["module_name", "FirstFrame_sim", "EndFrame_sim"])
        for module, (firsts, ends) in sorted(by_module.items()):
            w.writerow([module, np.mean(firsts), np.mean(ends)])


def build_pipe(args):
    from tvi.core.config import TINY_UNET, UNetConfig
    from tvi.pipelines.factory import build_pipeline, build_tiny_pipeline

    rng = jax.random.PRNGKey(args.seed)
    with_cn = not args.without_controlnet
    with_proj = args.use_projector or args.do_motion_prompt
    # the concat (do_motion_prompt) path projects [first, end] -> 2x dim;
    # plain --use_projector projects a single embedding (pipeline:446-449)
    dim = TINY_UNET.cross_attention_dim if args.tiny else UNetConfig().cross_attention_dim
    proj_in = 2 * dim if args.do_motion_prompt else dim
    params = None
    if args.model:
        from tvi.io.orbax_ckpt import load_pipeline_params

        params = load_pipeline_params(args.model)
    if args.tiny:
        return build_tiny_pipeline(rng, with_controlnet=with_cn,
                                   with_projector=with_proj,
                                   projector_input_dim=proj_in,
                                   params=params)
    return build_pipeline(rng, with_controlnet=with_cn,
                          with_projector=with_proj,
                          projector_input_dim=proj_in,
                          params=params)


def main(argv=None):
    args = parse_args(argv)
    import PIL.Image

    # fail fast before the expensive model build
    folders = sorted(os.listdir(args.assets)) if os.path.isdir(args.assets) else []
    folders = [f for f in folders
               if os.path.isdir(os.path.join(args.assets, f, "input_frames"))]
    if not folders and args.tiny:
        # self-contained smoke path: synthesize a two-frame gradient asset so
        # `--tiny --steps 2` runs end-to-end on a fresh checkout (the
        # reference's test.py assumes curated asset folders exist;
        # reference src/test.py:60-84)
        import numpy as np
        demo = os.path.join(args.assets, "_tiny_demo", "input_frames")
        os.makedirs(demo, exist_ok=True)
        h = w = 64
        yy, xx = np.meshgrid(np.linspace(0, 255, h), np.linspace(0, 255, w),
                             indexing="ij")
        for i, arr in enumerate((xx, yy)):
            img = np.stack([arr, arr[::-1], np.full_like(arr, 96 + 64 * i)],
                           -1).astype(np.uint8)
            PIL.Image.fromarray(img).save(os.path.join(demo, f"image_{i}.png"))
        folders = ["_tiny_demo"]
        print(f"[test_sweep] synthesized tiny demo asset under {demo}")
    if not folders:
        raise SystemExit(f"[test_sweep] no asset folders with input_frames/ "
                         f"under {args.assets}")

    pipe = build_pipe(args)
    ablations = CondAblations(
        without_front_embedding=args.without_front_embedding,
        without_end_embedding=args.without_end_embedding,
        without_front_channel=args.without_front_channel,
        without_end_channel=args.without_end_channel,
        second_channel_firstframe_condition=args.seoncd_channel_firstframe_condition,
        last_channel_lastframe_condition=args.last_channel_lastframe_condition,
        channelwise_all_front=args.channelwise_all_front,
        channelwise_all_end=args.channelwise_all_end,
    )
    cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.steps, fps=args.fps,
        motion_bucket_id=args.motion_bucket_id,
        with_control=not args.without_controlnet,
        controlnet_cond_scale=args.controlnet_cond_scale)

    for folder in folders:
        in_dir = os.path.join(args.assets, folder, "input_frames")
        out_dir = os.path.join(args.output_dir, folder)
        os.makedirs(out_dir, exist_ok=True)
        img0 = pil_to_array(PIL.Image.open(os.path.join(in_dir, "image_0.png")),
                            args.height, args.width)
        img1 = pil_to_array(PIL.Image.open(os.path.join(in_dir, "image_1.png")),
                            args.height, args.width)

        cn_cond = None
        track_path = os.path.join(in_dir, "track.txt")
        if not args.with_no_track and os.path.exists(track_path):
            ch, cw = pipe.controlnet_cond_size(args.height, args.width)
            tracks = load_track_file(track_path, cw, ch, args.num_frames,
                                     orig_width=args.width,
                                     orig_height=args.height)
            cn_cond = render_heatmap_video(tracks, cw, ch)[None]

        out = pipe(img0, img1, jax.random.PRNGKey(args.seed), cfg,
                   ablations=ablations, controlnet_cond=cn_cond,
                   do_motion_prompt=args.do_motion_prompt,
                   use_temporal_attention_bias=args.use_attentionmask,
                   collect_attn_stats=args.controlnet_attentioncontrol)
        if args.controlnet_attentioncontrol:
            frames, records = out
            write_attn_csvs(records, out_dir)
        else:
            frames = out
        for i, frame in enumerate(frames[0]):
            PIL.Image.fromarray(frame).save(
                os.path.join(out_dir, f"{folder}_frame_{i}.png"))
        save_gif(frames[0], os.path.join(out_dir, f"{folder}.gif"))
        print(f"[test_sweep] {folder}: wrote {len(frames[0])} frames", flush=True)


if __name__ == "__main__":
    main()
