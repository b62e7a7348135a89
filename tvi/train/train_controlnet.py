"""ControlNet trainer CLI — svd-temporal-controlnet/train_svd.py parity:
trains the whole depth/trajectory ControlNet against a frozen 8-channel SVD
UNet with first-frame conditioning, conditioning dropout, per-sample motion
buckets and EMA.

    python -m tvi.train.train_controlnet --data_root <webvid-style root> \
        --width 512 --height 512 --sample_n_frames 14
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tvi.core.config import (
    TINY_CLIP,
    TINY_UNET,
    TINY_VAE,
    CLIPVisionConfig,
    ControlNetConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from tvi.data.frame_dataset import WebVidStyleDataset
from tvi.io.orbax_ckpt import CheckpointManager
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.controlnet import ControlNetSVDModel
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder
from tvi.parallel.mesh import MeshSpec, create_mesh, shard_batch
from tvi.train.params import count_params
from tvi.train.trainer import create_train_state, make_controlnet_train_step
from tvi.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="outputs/train_controlnet")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--sample_n_frames", type=int, default=14)
    p.add_argument("--per_gpu_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=50_000)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--conditioning_dropout_prob", type=float, default=0.1)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="blockwise int8-moment AdamW (reference --use_8bit_adam; tvi/train/adam8bit.py)")
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--mixed_precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic_data", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    # training default: 4D temporal kernels off (slower chunked-reference
    # VJP — see train_interp.main / PERF.md r4 s4); TVI_TEMPORAL_4D=1 overrides
    os.environ.setdefault("TVI_TEMPORAL_4D", "0")
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    json.dump(vars(args), open(os.path.join(args.output_dir, "args.json"), "w"),
              indent=2)
    from tvi.core.precision import DEFAULT_POLICY, FP32_POLICY

    policy = DEFAULT_POLICY if args.mixed_precision == "bf16" else FP32_POLICY
    dtype = policy.compute_dtype
    n_dev = len(jax.devices())
    mesh = create_mesh(MeshSpec(data=n_dev))
    global_batch = args.per_gpu_batch_size * n_dev

    cfg = TrainConfig(
        output_dir=args.output_dir, seed=args.seed,
        learning_rate=args.learning_rate, use_ema=args.use_ema,
        use_8bit_adam=args.use_8bit_adam,
        conditioning_dropout_prob=args.conditioning_dropout_prob,
        checkpointing_steps=args.checkpointing_steps,
        max_train_steps=args.max_train_steps, trainable="controlnet",
        gradient_checkpointing=args.gradient_checkpointing)

    if args.tiny:
        unet_cfg = TINY_UNET.replace(in_channels=8)
        vae_cfg = TINY_VAE
        clip_cfg = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)
    else:
        # subproject UNet: stock SVD, 8 input channels, single CLIP token
        unet_cfg, vae_cfg, clip_cfg = UNetConfig(in_channels=8), VAEConfig(), CLIPVisionConfig()

    unet = UNetSpatioTemporalConditionModel(
        unet_cfg, dtype=dtype,
        gradient_checkpointing=cfg.gradient_checkpointing)
    vae = AutoencoderKLTemporalDecoder(vae_cfg, dtype=dtype)
    clip = CLIPVisionModelWithProjection(clip_cfg, dtype=dtype)
    cn = ControlNetSVDModel(ControlNetConfig.from_unet(unet_cfg), dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    r_init, r_train = jax.random.split(rng)

    # one jitted init program (fp32 intermediates = freed program temps;
    # avoids the arena fragmentation that OOMed the full-size step —
    # PERF.md round 3) with frozen UNet/VAE/CLIP at compute dtype —
    # reference weight_dtype semantics (train_svd.py loads frozen models
    # at weight_dtype)
    @jax.jit
    def build_params(rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        lat = 8  # init shapes are resolution-independent
        cn_params = cn.init(
            r4, jnp.zeros((1, 2, lat, lat, 8), dtype), jnp.zeros(()),
            jnp.zeros((1, 1, unet_cfg.cross_attention_dim), dtype),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 2, lat * 8, lat * 8, 3), dtype))
        frozen = policy.cast_to_compute({
            "unet": unet.init_params(r1),
            "vae": vae.init(r2, jnp.zeros((1, 32, 32, 3), dtype), 1),
            "clip": clip.init(r3, jnp.zeros(
                (1, clip_cfg.image_size, clip_cfg.image_size, 3), dtype)),
        })
        return cn_params, frozen

    cn_params, frozen = build_params(r_init)
    print(f"[train_controlnet] controlnet params: {count_params(cn_params):,}", flush=True)

    step_fn, optimizer = make_controlnet_train_step(
        unet=unet, vae=vae, clip=clip, controlnet=cn, cfg=cfg, mesh=mesh, dtype=dtype)
    state = create_train_state(cn_params, optimizer, use_ema=args.use_ema)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             total_limit=args.checkpoints_total_limit,
                             save_interval_steps=args.checkpointing_steps)

    vsf = vae_cfg.downscale_factor
    cond_h = (args.height // vsf) * 8
    cond_w = (args.width // vsf) * 8
    if args.data_root and not args.synthetic_data:
        ds = WebVidStyleDataset(args.data_root, width=args.width,
                                height=args.height,
                                sample_n_frames=args.sample_n_frames)
        batches = ds.batches(global_batch)
    else:
        print("[train_controlnet] using synthetic data", flush=True)
        rs = np.random.RandomState(args.seed)

        def synthetic():
            while True:
                yield {
                    "video": rs.rand(global_batch, args.sample_n_frames,
                                     args.height, args.width, 3).astype(np.float32) * 2 - 1,
                    "controlnet_cond": rs.rand(global_batch, args.sample_n_frames,
                                               cond_h, cond_w, 3).astype(np.float32),
                    "motion_values": rs.rand(global_batch).astype(np.float32) * 255,
                }
        batches = synthetic()

    logger = MetricLogger(args.output_dir)
    for step_idx in range(args.max_train_steps):
        batch = shard_batch(mesh, next(batches))
        state, metrics = step_fn(state, frozen, batch,
                                 jax.random.fold_in(r_train, step_idx))
        if step_idx % 10 == 0 or step_idx == args.max_train_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            logger.log(step_idx, m)
            print(f"step {step_idx}: " + " ".join(f"{k}={v:.5f}" for k, v in m.items()),
                  flush=True)
        ckpt.save(step_idx + 1, state)
    ckpt.wait()
    logger.close()
    print("[train_controlnet] done", flush=True)


if __name__ == "__main__":
    main()
