"""Two-frame interpolation trainer CLI — the TPU-native src/train.py (and,
with ``--decoupled``, src/train_decouples.py).

Usage (mirrors src/train.sh flag names where they exist):

    python -m tvi.train.train_interp \
        --data_root TrainData --output_dir outputs/run1 \
        --width 512 --height 320 --sample_n_frames 14 \
        --per_gpu_batch_size 2 --max_train_steps 50000 \
        --checkpointing_steps 50 --validation_steps 1000

Distribution replaces `accelerate launch --config_file acc_N.yaml` with a
single process driving a jax data mesh (all local devices; multi-host via
``jax.distributed.initialize`` when JAX_COORDINATOR is set).  ``--tiny``
swaps in the thin test configs for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tvi.core.config import (
    TINY_CLIP,
    TINY_UNET,
    TINY_VAE,
    CLIPVisionConfig,
    PipelineConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from tvi.data.frame_dataset import FrameInterpolationDataset
from tvi.io.orbax_ckpt import CheckpointManager
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.projector import FeatureProjector, MotionEncoder
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder
from tvi.parallel.mesh import MeshSpec, create_mesh, shard_batch
from tvi.train.params import count_params, partition_params, temporal_predicate
from tvi.train.trainer import create_train_state, make_interp_train_step
from tvi.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None,
                   help="TrainData root (frame_XX folders); synthetic data when omitted")
    p.add_argument("--output_dir", type=str, default="outputs/train_interp")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--sample_n_frames", type=int, default=14)
    p.add_argument("--per_gpu_batch_size", type=int, default=2,
                   help="per-device batch size (reference flag name)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--max_train_steps", type=int, default=50_000)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--checkpointing_steps", type=int, default=50)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--validation_steps", type=int, default=1000)
    p.add_argument("--validation_lengths", type=str, default="",
                   help="comma-separated frame counts rendered at validation; "
                        "default '<sample_n_frames>,40' (reference "
                        "model_lengths=[14,40], src/train.py:741)")
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--mixed_precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="blockwise int8-moment AdamW (reference --use_8bit_adam; tvi/train/adam8bit.py)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--projector_input_dim", type=int, default=2048)
    p.add_argument("--report_to", type=str, default="jsonl")
    # decoupled-trainer flags (train_decouples.py:1565-1573)
    p.add_argument("--decoupled", action="store_true",
                   help="train_decouples.py variant: motion encoder, zeros "
                        "instead of mask token")
    p.add_argument("--with_controlnet", action="store_true",
                   help="decoupled trainer's frozen-ControlNet branch "
                        "(train_decouples.py:740-743,956-976, the inverse of "
                        "its --without_controlnet): the dataset emits SIFT "
                        "point tracks rendered as Gaussian-heatmap videos")
    p.add_argument("--use_attentionmask", action="store_true")
    p.add_argument("--use_monotonicity_loss", action="store_true")
    p.add_argument("--frame_matching", action="store_true")
    p.add_argument("--lambda_attn", type=float, default=1.0)
    p.add_argument("--tiny", action="store_true", help="thin test configs")
    p.add_argument("--synthetic_data", action="store_true",
                   help="random batches (smoke/benchmark runs)")
    p.add_argument("--topology", type=str, default="auto",
                   help="mesh preset (tvi/parallel/topologies.py), e.g. "
                        "v5e-8, acc_0_1_2_3, auto")
    p.add_argument("--shard_dir", type=str, default=None,
                   help="packed .tvis shards served by the native C++ loader "
                        "(tvi/data/shards.py) instead of the Python dataset")
    return p.parse_args(argv)


def synthetic_batches(rng: np.random.RandomState, b, f, h, w,
                      with_motion=False, with_cond=False):
    while True:
        video = rng.rand(b, f, h, w, 3).astype(np.float32) * 2 - 1
        batch = {"video": video, "first": video[:, 0], "end": video[:, -1]}
        if with_motion:
            gray = video.mean(-1, keepdims=True)
            batch["motion_first"] = np.abs(gray[:, 1] - gray[:, 0])
            batch["motion_end"] = np.abs(gray[:, -1] - gray[:, -2])
        if with_cond:
            ch, cw = with_cond  # (cond_h, cond_w): 8x the latent grid
            batch["controlnet_cond"] = rng.rand(b, f, ch, cw, 3).astype(np.float32)
        yield batch


def main(argv=None):
    # Training default: transposed-IO temporal kernels OFF — their chunked-
    # reference VJP costs +0.14 s/step (+0.19 GB temps) at the full-size
    # geometry (2.64 vs 2.50 s, PERF.md r4 s4), while the forward win is
    # a serving-scale effect.  Override with TVI_TEMPORAL_4D=1.
    os.environ.setdefault("TVI_TEMPORAL_4D", "0")
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "args.json"), "w") as fh:
        json.dump(vars(args), fh, indent=2)  # parity: train.py:176-179

    from tvi.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    from tvi.core.precision import DEFAULT_POLICY, FP32_POLICY

    policy = DEFAULT_POLICY if args.mixed_precision == "bf16" else FP32_POLICY
    dtype = policy.compute_dtype
    from tvi.parallel.topologies import get_mesh_spec

    mesh = create_mesh(get_mesh_spec(args.topology))
    n_dev = mesh.devices.size
    global_batch = args.per_gpu_batch_size * n_dev

    lr = args.learning_rate * (global_batch * args.gradient_accumulation_steps
                               if args.scale_lr else 1)
    cfg = TrainConfig(
        output_dir=args.output_dir, seed=args.seed, width=args.width,
        height=args.height, sample_n_frames=args.sample_n_frames,
        per_device_batch_size=args.per_gpu_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        gradient_checkpointing=args.gradient_checkpointing,
        max_train_steps=args.max_train_steps, learning_rate=lr,
        lr_warmup_steps=args.lr_warmup_steps,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validation_steps=args.validation_steps, use_ema=args.use_ema,
        use_8bit_adam=args.use_8bit_adam,
        use_attention_mask=args.use_attentionmask,
        use_monotonicity_loss=args.use_monotonicity_loss,
        frame_matching=args.frame_matching, lambda_attn=args.lambda_attn,
        mask_token_conditioning=not args.decoupled,
        projector_input_dim=args.projector_input_dim,
        mixed_precision=args.mixed_precision,
    )

    if args.tiny:
        unet_cfg, vae_cfg = TINY_UNET, TINY_VAE
        clip_cfg = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)
        proj_in = 2 * TINY_UNET.cross_attention_dim
    else:
        unet_cfg, vae_cfg, clip_cfg = UNetConfig(), VAEConfig(), CLIPVisionConfig()
        proj_in = args.projector_input_dim

    unet = UNetSpatioTemporalConditionModel(
        unet_cfg, dtype=dtype,
        gradient_checkpointing=cfg.gradient_checkpointing)
    vae = AutoencoderKLTemporalDecoder(vae_cfg, dtype=dtype)
    clip = CLIPVisionModelWithProjection(clip_cfg, dtype=dtype)
    projector = FeatureProjector(output_dim=unet_cfg.cross_attention_dim, dtype=dtype)
    motion_encoder = MotionEncoder(output_dim=unet_cfg.cross_attention_dim,
                                   dtype=dtype) if args.decoupled else None
    controlnet = None
    if args.with_controlnet:
        from tvi.core.config import ControlNetConfig
        from tvi.models.controlnet import ControlNetSVDModel

        controlnet = ControlNetSVDModel(
            ControlNetConfig.from_unet(unet_cfg), dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    r_init, r_train = jax.random.split(rng)
    print(f"[train_interp] initializing params (devices={n_dev}, dtype={dtype.__name__})",
          flush=True)

    # ONE jitted init program: the fp32 init intermediates (UNet tree +
    # module-init temps) are program temps freed at program exit — a
    # host-side init sequence fragments the 16 GB arena badly enough that
    # the full-size step RESOURCE_EXHAUSTs afterwards (PERF.md round-3
    # probe).  Frozen weights come out at the compute dtype — the
    # reference holds its frozen vae/image_encoder at weight_dtype
    # (src/train.py:269-296); compute casts params at use anyway, so this
    # halves their HBM without changing the loss.
    @jax.jit
    def build_params(rng):
        r_unet, r_vae, r_clip, r_proj, r_me, r_mask = jax.random.split(rng, 6)
        unet_train, unet_frozen = partition_params(
            unet.init_params(r_unet), temporal_predicate)
        trainable = {"unet": unet_train,
                     "projector": projector.init(
                         r_proj, jnp.zeros((1, 1, proj_in), dtype))}
        if motion_encoder is not None:
            trainable["motion_encoder"] = motion_encoder.init(
                r_me, jnp.zeros((1, 64, 64, 1), dtype))
        frozen = {
            "unet": unet_frozen,
            "vae": vae.init(r_vae, jnp.zeros((1, 32, 32, 3), dtype), 1),
            "clip": clip.init(r_clip, jnp.zeros(
                (1, clip_cfg.image_size, clip_cfg.image_size, 3), dtype)),
            "mask_token": jax.random.normal(r_mask, (4,), jnp.float32),
        }
        if controlnet is not None:
            cn_cfg = controlnet.config
            frozen["controlnet"] = controlnet.init(
                jax.random.fold_in(r_me, 1),
                jnp.zeros((1, 2, 8, 8, cn_cfg.in_channels), dtype), jnp.zeros(()),
                (jnp.zeros((1, 2, cn_cfg.cross_attention_dim), dtype),
                 jnp.zeros((1, 1, cn_cfg.cross_attention_dim), dtype)),
                jnp.zeros((1, 3)),
                jnp.zeros((1, 2, 64, 64, cn_cfg.conditioning_channels), dtype))
        return trainable, policy.cast_to_compute(frozen)

    trainable, frozen = build_params(r_init)
    print(f"[train_interp] trainable params: {count_params(trainable):,} / "
          f"total {count_params(trainable) + count_params(frozen):,}", flush=True)

    step_fn, optimizer = make_interp_train_step(
        unet=unet, vae=vae, clip=clip, projector=projector, cfg=cfg,
        motion_encoder=motion_encoder, controlnet=controlnet,
        mesh=mesh, dtype=dtype)
    state = create_train_state(trainable, optimizer, use_ema=args.use_ema)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             total_limit=args.checkpoints_total_limit,
                             save_interval_steps=args.checkpointing_steps)
    start_step = 0
    if args.resume_from_checkpoint:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        got_step, restored = CheckpointManager(
            args.resume_from_checkpoint).restore_latest(abstract)
        if got_step is not None:
            state, start_step = restored, got_step
            print(f"[train_interp] resumed from step {start_step}", flush=True)

    if args.shard_dir:
        from tvi.data.shards import NativeFrameLoader

        shard_paths = sorted(
            os.path.join(args.shard_dir, f)
            for f in os.listdir(args.shard_dir) if f.endswith(".tvis"))
        loader = NativeFrameLoader(shard_paths, global_batch, seed=args.seed)
        print(f"[train_interp] native loader: {loader.num_records} records "
              f"across {len(shard_paths)} shards", flush=True)
        batches = loader.batches()
    elif args.data_root and not args.synthetic_data:
        vsf = vae_cfg.downscale_factor
        ds = FrameInterpolationDataset(
            args.data_root, width=args.width, height=args.height,
            sample_n_frames=args.sample_n_frames,
            with_motion_maps=args.decoupled,
            with_point_tracks=args.with_controlnet,
            cond_height=args.height // vsf * 8, cond_width=args.width // vsf * 8,
            seed=args.seed)
        batches = ds.batches(global_batch)
    else:
        print("[train_interp] using synthetic data", flush=True)
        vsf = vae_cfg.downscale_factor
        batches = synthetic_batches(
            np.random.RandomState(args.seed), global_batch,
            args.sample_n_frames, args.height, args.width,
            with_motion=args.decoupled,
            with_cond=(args.height // vsf * 8, args.width // vsf * 8)
            if args.with_controlnet else False)

    def run_validation(step_idx, state, val_batch):
        """Periodic validation: build the inference pipeline from the live
        training weights and generate a video from the first batch's
        endpoint frames (reference src/train.py:710-791, which renders the
        flood assets to wandb; here GIFs land in output_dir/validation)."""
        from tvi.diffusion.euler import EulerDiscreteScheduler
        from tvi.pipelines.interp import InterpolationPipeline
        from tvi.train.params import merge_params
        from tvi.utils.images import save_gif

        live = state.ema if (args.use_ema and state.ema is not None) else state.trainable
        pipe = InterpolationPipeline(
            unet=unet, unet_params=merge_params(live["unet"], frozen["unet"]),
            vae=vae, vae_params=frozen["vae"],
            clip=clip, clip_params=frozen["clip"],
            mask_token=frozen["mask_token"],
            scheduler=EulerDiscreteScheduler(),
            projector=projector, projector_params=live["projector"],
            dtype=dtype)
        from tvi.core.config import PipelineConfig

        if args.validation_lengths:
            lengths = [int(x) for x in args.validation_lengths.split(",") if x]
        else:
            # reference renders every validation video at BOTH 14 and 40
            # frames (model_lengths = [14, 40], src/train.py:741) — the
            # 40-frame geometry exercises the dynamic-frame-count path
            lengths = sorted({args.sample_n_frames, 40})
        first01 = (np.asarray(val_batch["first"][:1]) + 1.0) / 2.0
        end01 = (np.asarray(val_batch["end"][:1]) + 1.0) / 2.0
        vdir = os.path.join(args.output_dir, "validation")
        os.makedirs(vdir, exist_ok=True)
        for n_frames in lengths:
            vcfg = PipelineConfig(height=args.height, width=args.width,
                                  num_frames=n_frames,
                                  num_inference_steps=8)
            frames = pipe(first01, end01, jax.random.PRNGKey(0), vcfg,
                          do_motion_prompt=True)
            save_gif(frames[0], os.path.join(
                vdir, f"step_{step_idx:06d}_f{n_frames}.gif"))
        print(f"[train_interp] validation gifs ({lengths} frames) at step "
              f"{step_idx}", flush=True)

    logger = MetricLogger(args.output_dir, project="flood_video_project",
                          use_wandb=args.report_to == "wandb")
    from tvi.utils.profiling import StepTimer

    timer = StepTimer()
    val_batch = None
    accum = args.gradient_accumulation_steps
    for step_idx in range(start_step, args.max_train_steps):
        if accum > 1:
            # the step scans over a leading (accum, micro_batch, ...) axis
            micros = [next(batches) for _ in range(accum)]
            host_batch = {k: np.stack([m[k] for m in micros]) for k in micros[0]}
            if val_batch is None:
                val_batch = micros[0]
        else:
            host_batch = next(batches)
            if val_batch is None:
                val_batch = host_batch
        host_batch.pop("point_tracks", None)  # host-side artifact; the step
        # consumes the rendered heatmaps in 'controlnet_cond'
        batch = shard_batch(mesh, host_batch, batch_axis=1 if accum > 1 else 0)
        r_step = jax.random.fold_in(r_train, step_idx)
        state, metrics = step_fn(state, frozen, batch, r_step)
        sps = timer.tick()
        if step_idx % 10 == 0 or step_idx == args.max_train_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            if sps is not None:
                m["steps_per_sec"] = sps
            logger.log(step_idx, m)
            print(f"step {step_idx}: " +
                  " ".join(f"{k}={v:.5f}" for k, v in m.items()), flush=True)
        if args.validation_steps > 0 and (step_idx + 1) % args.validation_steps == 0:
            run_validation(step_idx + 1, state, val_batch)
        ckpt.save(step_idx + 1, state)
    ckpt.wait()
    # final pipeline export (reference: pipeline.save_pretrained at
    # src/train.py:797-805) — full merged params usable by the apps' --model
    from tvi.io.orbax_ckpt import export_pipeline_params
    from tvi.train.params import merge_params as _merge

    live = state.ema if (args.use_ema and state.ema is not None) else state.trainable
    frozen32 = policy.cast_to_param(frozen)  # export keeps the fp32 layout
    export_pipeline_params(os.path.join(args.output_dir, "pipeline"), {
        "unet": _merge(live["unet"], frozen32["unet"]),
        "vae": frozen32["vae"], "clip": frozen32["clip"],
        "mask_token": frozen32["mask_token"],
        "projector": live["projector"],
    })
    logger.close()
    print("[train_interp] done (pipeline exported)", flush=True)


if __name__ == "__main__":
    main()
