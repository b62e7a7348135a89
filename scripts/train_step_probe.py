"""One FULL-SIZE interp train step on the real TPU chip (VERDICT r2 item 5).

Reference workload: src/train.py at the launcher geometry — 512x320,
sample_n_frames=14, per-device batch 2 (src/train.sh:8-17), temporal-subset
training with EDM loss.  Runs ONE jitted train step with gradient
checkpointing (nn.remat over the UNet blocks) and reports step wall time and
device memory; without remat the full-size backward does not fit 16 GB.

Usage:  python scripts/train_step_probe.py [--no-remat] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# repo-local default: /tmp is wiped between containers, /root/repo persists
_REPO_TPU_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "tpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TVI_JAX_CACHE", _REPO_TPU_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    # match the trainer CLIs' default: 4D temporal kernels off in training
    # (their chunked-reference VJP measured +0.14 s/step — PERF.md r4 s4)
    os.environ.setdefault("TVI_TEMPORAL_4D", "0")
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--opt", choices=["adam", "sgd"], default="adam",
                    help="sgd = no moment tensors (-3.2 GB): memory-envelope "
                         "diagnostic for whether AdamW fits next to the step")
    args = ap.parse_args()

    from tvi.core.config import CLIPVisionConfig, TrainConfig, UNetConfig, VAEConfig
    from tvi.models.clip_vision import CLIPVisionModelWithProjection
    from tvi.models.projector import FeatureProjector
    from tvi.models.unet_st import UNetSpatioTemporalConditionModel
    from tvi.models.vae import AutoencoderKLTemporalDecoder
    from tvi.train.params import partition_params, temporal_predicate
    from tvi.train.trainer import create_train_state, make_interp_train_step

    dtype = jnp.bfloat16
    unet = UNetSpatioTemporalConditionModel(
        UNetConfig(), dtype=dtype, param_dtype=jnp.float32,
        gradient_checkpointing=not args.no_remat)
    vae = AutoencoderKLTemporalDecoder(VAEConfig(), dtype=dtype,
                                       param_dtype=jnp.float32)
    clip = CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=dtype,
                                         param_dtype=jnp.float32)
    projector = FeatureProjector(output_dim=UNetConfig().cross_attention_dim,
                                 dtype=dtype, param_dtype=jnp.float32)

    print("initializing params ...", flush=True)
    from tvi.core.precision import DEFAULT_POLICY

    # Build EVERYTHING inside one jitted program: the fp32 init
    # intermediates (5.8 GB UNet tree + module-init temps) become program
    # temps guaranteed freed at program exit, instead of thousands of
    # host-visible allocations whose free pattern fragments the 15.75 GB
    # arena before the step's big contiguous temps are requested.
    # Frozen weights live at compute dtype (reference weight_dtype
    # semantics, src/train.py:269-296): fp32 frozen weights alone push the
    # full-size step to 16.67 GB at compile (round-3 OOM probe).
    @jax.jit
    def build(rng):
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        unet_params = unet.init_params(r1)
        unet_train, unet_frozen = partition_params(unet_params,
                                                   temporal_predicate)
        frozen = DEFAULT_POLICY.cast_to_compute({
            "unet": unet_frozen,
            "vae": vae.init(r2, jnp.zeros((1, 64, 64, 3), dtype), 1),
            "clip": clip.init(r3, jnp.zeros((1, 224, 224, 3), dtype)),
            "mask_token": jax.random.normal(r5, (4,)),
        })
        trainable = {
            "unet": unet_train,
            "projector": projector.init(r4, jnp.zeros((1, 1, 2048), dtype)),
        }
        return trainable, frozen

    trainable, frozen = build(jax.random.PRNGKey(0))
    n_train = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(trainable))
    n_total = n_train + sum(int(np.prod(x.shape)) for x in jax.tree.leaves(frozen))
    print(f"trainable {n_train/1e6:.1f}M / total {n_total/1e9:.2f}B params",
          flush=True)

    cfg = TrainConfig(per_device_batch_size=args.batch,
                      height=args.height, width=args.width,
                      sample_n_frames=args.frames,
                      gradient_checkpointing=not args.no_remat)
    import optax
    override = optax.sgd(cfg.learning_rate) if args.opt == "sgd" else None
    step_fn, optimizer = make_interp_train_step(
        unet=unet, vae=vae, clip=clip, projector=projector, cfg=cfg,
        optimizer=override, dtype=dtype)
    state = create_train_state(trainable, optimizer)

    b, f, h, w = args.batch, args.frames, args.height, args.width
    rs = np.random.RandomState(0)
    video = (rs.rand(b, f, h, w, 3).astype(np.float32) * 2 - 1)
    batch = {"video": video, "first": video[:, 0], "end": video[:, -1]}

    def mem(tag):
        try:
            s = jax.devices()[0].memory_stats()
            print(f"[mem:{tag}] in_use={s.get('bytes_in_use', 0)/1e9:.2f} GB "
                  f"peak={s.get('peak_bytes_in_use', 0)/1e9:.2f} GB "
                  f"limit={s.get('bytes_limit', 0)/1e9:.2f} GB", flush=True)
        except Exception as e:
            print(f"[mem:{tag}] unavailable: {e}", flush=True)

    mem("before_step")
    print("compiling step 1 (AOT compile may take many minutes)", flush=True)
    t0 = time.perf_counter()
    compiled = step_fn.lower(state, frozen, batch,
                             jax.random.PRNGKey(1)).compile()
    try:
        ma = compiled.memory_analysis()
        print(f"[compiled] args {ma.argument_size_in_bytes/1e9:.2f} GB, "
              f"out {ma.output_size_in_bytes/1e9:.2f} GB "
              f"(alias {ma.alias_size_in_bytes/1e9:.2f}), "
              f"temp {ma.temp_size_in_bytes/1e9:.2f} GB -> total "
              f"{(ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes)/1e9:.2f} GB"
              f" of 15.75 usable", flush=True)
    except Exception as e:  # tunnel backends may not expose analysis
        print(f"[compiled] memory_analysis unavailable: {e}", flush=True)
    print(f"compile done in {time.perf_counter() - t0:.0f} s; running step 1",
          flush=True)
    t0 = time.perf_counter()
    try:
        state, metrics = compiled(state, frozen, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
    except Exception:
        mem("step1_failed")
        raise
    t1 = time.perf_counter()
    print(f"step 1 (incl. compile): {t1 - t0:.1f} s, loss={loss:.5f}",
          flush=True)
    assert np.isfinite(loss)

    t0 = time.perf_counter()
    state, metrics = compiled(state, frozen, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])  # scalar readback = tunnel-safe sync
    t1 = time.perf_counter()
    print(f"step 2 (steady state): {t1 - t0:.2f} s, loss={loss:.5f}",
          flush=True)

    try:
        stats = jax.devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        print(f"device peak memory: {peak:.2f} GB "
              f"(limit {stats.get('bytes_limit', 0)/1e9:.1f} GB)", flush=True)
    except Exception as e:  # tunnel backends may not expose stats
        print(f"memory_stats unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
