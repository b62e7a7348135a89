"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): frames/sec/chip for the 25-frame 576x1024 SVD
interpolation pipeline (25 denoise steps, CFG pair batched), measured on one
TPU chip with random-init weights (weights don't affect throughput).

The measured quantity is the full per-denoise-step latency (UNet fwd on the
CFG pair + scheduler step, jitted as one program) plus the chunked VAE
decode, combined as:

    frames_per_sec = num_frames / (steps * step_latency + decode_time)

``vs_baseline`` divides by an A100 diffusers SVD-xt baseline of 0.625
frames/sec (~40 s for 25 frames @ 576x1024, 25 steps — the reference
publishes no numbers, SURVEY §6; this constant is the driver-set comparison
point and is reported explicitly in the JSON for auditability).

Env overrides: TVI_BENCH_HEIGHT/WIDTH/FRAMES/STEPS, TVI_BENCH_REPEATS.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

_T0 = time.time()
# shared progress state for the watchdog + breadcrumbs (VERDICT r4 item 1:
# when the driver's timeout kills this process, the round must still record
# evidence — a phase trail on stderr and a partial JSON on stdout).
_STATE: dict = {"phase": "import", "step_latency_s": None, "decode_s": None}


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _set_phase(phase: str) -> None:
    _STATE["phase"] = phase
    _log(phase)

# persistent compile cache: headline-size XLA compiles take tens of minutes
# through the axon remote-compile tunnel; cache them across runs.  The
# default lives INSIDE the repo (not /tmp) because /tmp is wiped between
# containers while /root/repo persists — entries proved portable
# cross-machine in round 2 (driver-side AOT cache loads), so a committed
# cache makes every fresh container start warm instead of paying ~35 min.
_REPO_TPU_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache", "tpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TVI_JAX_CACHE", _REPO_TPU_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# cache even sub-second programs: through the axon tunnel each tiny-op
# compile costs ~0.4 s of remote round trip, and the r5s1 instrumented run
# counted 1297 of them filtered out by the old 1.0 s threshold
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:  # why a compile wasn't served from the committed cache (r4 post-mortem:
    # the driver's run died in what was probably a silent cache-miss AOT)
    jax.config.update("jax_explain_cache_misses", True)
except Exception:  # noqa: BLE001 — older jaxlib without the flag
    pass

A100_BASELINE_FPS = 0.625

# Measured-roofline ceiling for this chip (PERF.md round-3 full-dependency
# probes): bf16 peak 149.4 TF/s, HBM 0.504 TB/s.  The headline pipeline is
# 25 steps x ~160 TFLOP + ~166 TFLOP decode => 100%-MXU ceiling ~0.89 f/s.
# The 3x-A100 target (1.875 f/s) is NOT reachable in bf16 on this chip, and
# int8 offers no envelope (96-153 TOPS measured).  pct_of_sol reports how
# close the measured number is to physics.
SOL_FPS_BF16 = 0.89


def _timed(fn, *args, repeats=3):
    """Times fn via a scalar readback (block_until_ready alone can lie over
    the axon tunnel — async dispatch returns before execution finishes)."""
    out = fn(*args)            # compile
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / repeats


@jax.jit
def _first_elem(x):
    return jax.numpy.ravel(x)[0].astype(jax.numpy.float32)


def _sync(out):
    leaves = jax.tree.leaves(out)
    float(_first_elem(leaves[0]))


def _partial_json(frames: int, steps: int, width: int, height: int) -> dict:
    """Headline JSON from whatever has been measured so far.

    Emitted (a) the moment step latency exists — before the decode phase —
    and (b) by the deadline watchdog.  If the process is killed later, the
    driver still parses this line (it takes the LAST JSON line; the full
    result supersedes it when the run completes).  While only the step is
    measured, decode is filled from the recorded 2.12-2.36 s band of every
    round-4 bench (PERF.md headline table) and flagged estimated.
    """
    step = _STATE.get("step_latency_s")
    decode = _STATE.get("decode_s")
    result = {
        "metric": f"frames/sec/chip ({frames}f {width}x{height}, {steps} steps)",
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "sol_fps_bf16": SOL_FPS_BF16,
        "partial": True,
        "phase": _STATE.get("phase"),
        "elapsed_s": round(time.time() - _T0, 1),
    }
    if step is not None:
        decode_est = decode if decode is not None else 2.24
        fps = frames / (steps * step + decode_est)
        result.update({
            "value": round(fps, 4),
            "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            "pct_of_sol": round(100 * fps / SOL_FPS_BF16, 1),
            "step_latency_s": round(step, 4),
            "decode_s": round(decode, 4) if decode is not None else None,
            "decode_estimated": decode is None,
        })
    return result


def _host_params(dev, init_thunk, seed=0):
    """Random-init params WITHOUT running flax init on the device: init
    executes the model eagerly op-by-op, and through the axon tunnel every
    tiny op is a ~0.4 s remote compile (615 s of the r5s1 cold run).
    Throughput doesn't depend on weight values, so take the tree structure
    abstractly (eval_shape: no compiles, Pallas-safe) and materialize
    leaves with host numpy + one bulk device_put."""
    import numpy as np

    shapes = jax.eval_shape(init_thunk)
    rs = np.random.RandomState(seed)

    def mat(s):
        return jax.device_put(
            (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), dev)

    out = jax.tree.map(mat, shapes)
    jax.block_until_ready(out)
    return out


def main():
    height = int(os.environ.get("TVI_BENCH_HEIGHT", 576))
    width = int(os.environ.get("TVI_BENCH_WIDTH", 1024))
    frames = int(os.environ.get("TVI_BENCH_FRAMES", 25))
    steps = int(os.environ.get("TVI_BENCH_STEPS", 25))
    repeats = int(os.environ.get("TVI_BENCH_REPEATS", 3))
    # chunk 10 measured 79 ms/frame vs 113 at chunk 5 (bigger chunks feed
    # the conv pipeline better; chunk 25 OOMs at 23 GB program HBM) —
    # scripts/perf_lab.py dec_chunk10.  25 frames decode as 2x10 + tail 5.
    decode_chunk = int(os.environ.get("TVI_BENCH_DECODE_CHUNK", 10))

    _set_phase("importing tvi")
    from tvi.core.config import UNetConfig, VAEConfig
    from tvi.diffusion.euler import EulerDiscreteScheduler
    from tvi.models.unet_st import UNetSpatioTemporalConditionModel
    from tvi.models.vae import AutoencoderKLTemporalDecoder

    _set_phase("dialing backend (jax.devices)")
    dev = jax.devices()[0]
    _set_phase(f"backend up: {dev}")
    cfg = UNetConfig()
    vae_cfg = VAEConfig()
    unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16,
                                            param_dtype=jnp.bfloat16)
    vae = AutoencoderKLTemporalDecoder(vae_cfg, dtype=jnp.bfloat16,
                                       param_dtype=jnp.bfloat16)
    _set_phase("building param tree (eval_shape + host numpy)")
    rng = jax.random.PRNGKey(0)
    params = _host_params(dev, lambda: unet.init_params(rng), seed=0)
    vae_params = _host_params(
        dev, lambda: vae.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 64, 64, 3), jnp.bfloat16), 1),
        seed=1)
    _set_phase("params on device")

    h, w = height // 8, width // 8
    b_cfg = 2  # CFG pair
    sched = EulerDiscreteScheduler()
    sigmas, timesteps = sched.set_timesteps(steps)

    latents = jax.random.normal(jax.random.PRNGKey(2), (1, frames, h, w, 4),
                                jnp.bfloat16)
    image_latents = jnp.zeros((b_cfg, frames, h, w, 5), jnp.bfloat16)
    ctx = (jnp.zeros((b_cfg, 2, cfg.cross_attention_dim), jnp.bfloat16),
           jnp.zeros((b_cfg, 1, cfg.cross_attention_dim), jnp.bfloat16))
    ids = jnp.zeros((b_cfg, 3), jnp.float32)
    guidance = jnp.linspace(1.0, 3.0, frames)[None, :, None, None, None]

    @jax.jit
    def denoise_step(params, latents, sigma, sigma_next, t):
        x = jnp.concatenate([latents] * 2)
        x = sched.scale_model_input(x, sigma).astype(jnp.bfloat16)
        x_in = jnp.concatenate([x, image_latents], axis=-1)
        noise_pred, _ = unet.apply(params, x_in, t, ctx, ids)
        uncond, cond = jnp.split(noise_pred.astype(jnp.float32), 2, axis=0)
        noise_pred = uncond + guidance * (cond - uncond)
        return sched.step(noise_pred, latents.astype(jnp.float32),
                          sigma, sigma_next).astype(latents.dtype)

    _set_phase("compiling+timing denoise step (cache-hit: ~1 min; "
               "cache-miss: ~25-35 min remote AOT)")
    step_latency = _timed(denoise_step, params, latents,
                          sigmas[0], sigmas[1], timesteps[0], repeats=repeats)
    _STATE["step_latency_s"] = step_latency
    _set_phase(f"step timed: {step_latency:.4f} s — emitting partial JSON")
    # evidence checkpoint: if the decode phase (or anything after) dies, the
    # driver still parses this line.  The final full JSON supersedes it.
    print(json.dumps(_partial_json(frames, steps, width, height)), flush=True)

    @jax.jit
    def decode(vae_params, z):
        dec = lambda c: vae.apply(vae_params, c / vae_cfg.scaling_factor,
                                  c.shape[0], method=vae.decode)
        n_full = (frames // decode_chunk) * decode_chunk
        if 0 < n_full and decode_chunk < frames:
            zc = z[:n_full].reshape(n_full // decode_chunk, decode_chunk,
                                    h, w, 4)
            out = jax.lax.map(dec, zc)
            out = out.reshape((n_full,) + out.shape[2:])
            if n_full < frames:  # ragged tail decoded as its own chunk
                out = jnp.concatenate([out, dec(z[n_full:])], axis=0)
            return out
        return dec(z)

    # average decode over the same repeat count as the step: a single warm
    # execution read 2.36 s where every prior recording sat at 2.14-2.15
    # (tunnel timing noise, ~0.01 f/s on the headline at repeats=1)
    _set_phase("compiling+timing chunked VAE decode")
    decode_time = _timed(decode, vae_params,
                         latents[0].astype(jnp.bfloat16), repeats=repeats)
    _STATE["decode_s"] = decode_time
    _set_phase(f"decode timed: {decode_time:.4f} s")

    total = steps * step_latency + decode_time
    fps = frames / total
    result = {
        "metric": f"frames/sec/chip ({frames}f {width}x{height}, {steps} steps)",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "sol_fps_bf16": SOL_FPS_BF16,
        "pct_of_sol": round(100 * fps / SOL_FPS_BF16, 1),
        "step_latency_s": round(step_latency, 4),
        "decode_s": round(decode_time, 4),
        "device": str(dev),
    }
    disabled = sorted(k for k, v in _SESSION4_KNOBS.items()
                      if os.environ.get(k) == v)
    if disabled:
        result["disabled_kernels"] = disabled
    _set_phase("done")
    print(json.dumps(result), flush=True)


# ---------------------------------------------------------------------------
# BASELINE.json configs 1/2/3/5 (VERDICT r4 item 4): `python bench.py
# --config N`.  Each prints ONE JSON line; the reference publishes no
# numbers for these (BASELINE.json "published": {}), so vs_baseline is null.
# ---------------------------------------------------------------------------

def main_config1():
    """Config 1 — SLERP tool: VAE-encode 2 keyframes, SLERP 8 intermediate
    latents, decode 10 frames at 256x256 (frame_slerp_interp.py spec)."""
    from tvi.apps.slerp_interp import build_slerp_fn
    from tvi.core.config import VAEConfig
    from tvi.models.vae import AutoencoderKLTemporalDecoder

    _set_phase("config1: building VAE")
    dev = jax.devices()[0]
    vae = AutoencoderKLTemporalDecoder(VAEConfig(), dtype=jnp.bfloat16,
                                       param_dtype=jnp.bfloat16)
    vae_params = _host_params(
        dev, lambda: vae.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 64, 64, 3), jnp.bfloat16), 1))
    img0 = jax.random.uniform(jax.random.PRNGKey(2), (256, 256, 3),
                              jnp.bfloat16) * 2 - 1
    img1 = jax.random.uniform(jax.random.PRNGKey(3), (256, 256, 3),
                              jnp.bfloat16) * 2 - 1
    fn = build_slerp_fn(vae, num_intermediate=8)
    _set_phase("config1: compiling+timing encode->slerp->decode")
    t = _timed(fn, vae_params, img0, img1,
               repeats=int(os.environ.get("TVI_BENCH_REPEATS", 3)))
    _set_phase("done")
    print(json.dumps({
        "metric": "slerp tool (2 keyframes -> 10 frames @ 256x256)",
        "value": round(10.0 / t, 3), "unit": "frames/sec/chip",
        "vs_baseline": None, "latency_s": round(t, 4),
        "device": str(dev)}), flush=True)


def main_config2():
    """Config 2 — dataset_construction steps 1-4 on a synthetic 240-frame
    256x256 video: frame split (cv2), folderize, restructure check,
    Farneback flow gate (the driver metadata says RAFT; the reference code
    is Farneback — SURVEY §2.4)."""
    import shutil
    import tempfile

    import cv2
    import numpy as np

    from tvi.data.construct import (
        flow_gate_video,
        folderize,
        split_video_into_frames,
        unfolderize,
    )

    n_frames, size = 240, 256
    root = tempfile.mkdtemp(prefix="tvi_bench_c2_")
    try:
        _set_phase("config2: synthesizing video")
        vid_path = os.path.join(root, "v.avi")
        wr = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"),
                             30, (size, size))
        rs = np.random.RandomState(0)
        base = rs.randint(0, 255, (size * 2, size * 2, 3), np.uint8)
        for i in range(n_frames):  # drifting crop = coherent optical flow
            wr.write(base[i % size:i % size + size, i % size:i % size + size])
        wr.release()

        t0 = time.perf_counter()
        _set_phase("config2: step1 frame split")
        split_root = os.path.join(root, "split")
        split_dir = os.path.join(split_root, "v")  # per-video subfolder
        n = split_video_into_frames(vid_path, split_dir)
        _set_phase("config2: step2 folderize")
        train_dir = os.path.join(root, "train")
        folderize(split_root, train_dir, gap=10)
        _set_phase("config2: step3 restructure check")
        unfolderize(train_dir, os.path.join(root, "seq"))
        _set_phase("config2: step4 flow gate")
        frames = [cv2.imread(os.path.join(split_dir, f))
                  for f in sorted(os.listdir(split_dir))[:60]]
        sims, flagged = flow_gate_video(frames)
        wall = time.perf_counter() - t0
        _set_phase("done")
        print(json.dumps({
            "metric": "dataset construction steps 1-4 (240f split+folderize"
                      " + 60f Farneback flow gate)",
            "value": round(n / wall, 2), "unit": "frames/sec",
            "vs_baseline": None, "wall_s": round(wall, 2),
            "frames": n, "flow_pairs": len(sims),
            "flagged": len(flagged)}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main_config3():
    """Config 3 — single-ControlNet denoise step, 14 frames @ 320x576
    (BASELINE.json config 3): trajectory ControlNet residuals + 9ch UNet +
    per-frame CFG + Euler step, one jitted program, CFG pair batched."""
    from tvi.core.config import ControlNetConfig, UNetConfig
    from tvi.diffusion.euler import EulerDiscreteScheduler
    from tvi.models.controlnet import ControlNetSVDModel
    from tvi.models.unet_st import UNetSpatioTemporalConditionModel

    height, width, frames = 320, 576, 14
    _set_phase("config3: building UNet + ControlNet")
    dev = jax.devices()[0]
    cfg = UNetConfig()
    cn_cfg = ControlNetConfig.from_unet(cfg)
    unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16,
                                            param_dtype=jnp.bfloat16)
    cn = ControlNetSVDModel(cn_cfg, dtype=jnp.bfloat16,
                            param_dtype=jnp.bfloat16)
    params = _host_params(dev, lambda: unet.init_params(jax.random.PRNGKey(0)))
    h, w = height // 8, width // 8
    b_cfg = 2
    ctx = (jnp.zeros((b_cfg, 2, cfg.cross_attention_dim), jnp.bfloat16),
           jnp.zeros((b_cfg, 1, cfg.cross_attention_dim), jnp.bfloat16))
    ids = jnp.zeros((b_cfg, 3), jnp.float32)
    cn_params = _host_params(
        dev, lambda: cn.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 2, h, w, cn_cfg.in_channels), jnp.bfloat16),
            jnp.zeros(()),
            (jnp.zeros((1, 2, cn_cfg.cross_attention_dim), jnp.bfloat16),
             jnp.zeros((1, 1, cn_cfg.cross_attention_dim), jnp.bfloat16)),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 2, h * 8, w * 8, 3), jnp.bfloat16)), seed=1)
    sched = EulerDiscreteScheduler()
    sigmas, timesteps = sched.set_timesteps(30)
    latents = jax.random.normal(jax.random.PRNGKey(2),
                                (1, frames, h, w, 4), jnp.bfloat16)
    image_latents = jnp.zeros((b_cfg, frames, h, w, 5), jnp.bfloat16)
    heatmaps = jnp.zeros((b_cfg, frames, h * 8, w * 8, 3), jnp.bfloat16)
    guidance = jnp.linspace(1.0, 3.0, frames)[None, :, None, None, None]

    @jax.jit
    def cn_denoise_step(params, cn_params, latents, sigma, sigma_next, t):
        x = jnp.concatenate([latents] * 2)
        x = sched.scale_model_input(x, sigma).astype(jnp.bfloat16)
        x_in = jnp.concatenate([x, image_latents], axis=-1)
        down_res, mid_res = cn.apply(cn_params, x_in, t, ctx, ids,
                                     heatmaps, 1.0)
        noise_pred, _ = unet.apply(params, x_in, t, ctx, ids,
                                   down_block_residuals=down_res,
                                   mid_block_residual=mid_res)
        uncond, cond = jnp.split(noise_pred.astype(jnp.float32), 2, axis=0)
        noise_pred = uncond + guidance * (cond - uncond)
        return sched.step(noise_pred, latents.astype(jnp.float32),
                          sigma, sigma_next).astype(latents.dtype)

    _set_phase("config3: compiling+timing ControlNet denoise step")
    t = _timed(cn_denoise_step, params, cn_params, latents,
               sigmas[0], sigmas[1], timesteps[0],
               repeats=int(os.environ.get("TVI_BENCH_REPEATS", 3)))
    _set_phase("done")
    print(json.dumps({
        "metric": f"ControlNet denoise step ({frames}f {width}x{height},"
                  " CFG pair)",
        "value": round(t, 4), "unit": "s/step", "vs_baseline": None,
        "device": str(dev)}), flush=True)


def main_config5():
    """Config 5 — ControlNet training step (train_svd.py parity: whole
    ControlNet trainable, frozen UNet/VAE/CLIP, first-frame conditioning,
    EDM loss, AdamW) at the reference train geometry 512x320 x 14f.
    TVI_BENCH_TRAIN_BATCH sets per-device batch (default 1)."""
    import numpy as np

    from tvi.core.config import (
        CLIPVisionConfig,
        ControlNetConfig,
        TrainConfig,
        UNetConfig,
        VAEConfig,
    )
    from tvi.models.clip_vision import CLIPVisionModelWithProjection
    from tvi.models.controlnet import ControlNetSVDModel
    from tvi.models.unet_st import UNetSpatioTemporalConditionModel
    from tvi.models.vae import AutoencoderKLTemporalDecoder
    from tvi.train.trainer import create_train_state, make_controlnet_train_step

    b = int(os.environ.get("TVI_BENCH_TRAIN_BATCH", 1))
    height, width = 320, 512
    frames = int(os.environ.get("TVI_BENCH_TRAIN_FRAMES", 14))
    _set_phase("config5: building models")
    dev = jax.devices()[0]
    ucfg = UNetConfig(in_channels=8)       # stock-SVD 8ch (train_svd.py)
    cn_cfg = ControlNetConfig.from_unet(ucfg)
    dtype = jnp.bfloat16
    unet = UNetSpatioTemporalConditionModel(ucfg, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(VAEConfig(), dtype=dtype, param_dtype=dtype)
    clip = CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=dtype,
                                         param_dtype=dtype)
    cn = ControlNetSVDModel(cn_cfg, dtype=dtype)  # trainable: fp32 params
    h, w = height // 8, width // 8

    # ONE jitted init program for ALL trees (train_step_probe pattern):
    # thousands of per-leaf device_puts fragment the 16 GB arena badly
    # enough that F=3 training RESOURCE_EXHAUSTs at runtime even though
    # its compiled total fits (measured r5 — same failure PERF.md round-3
    # session 3 diagnosed); a single program allocates in one clean pass.
    @jax.jit
    def init_all():
        r0, r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 4)
        frozen = {
            "unet": unet.init_params(r0),
            "vae": vae.init(r1, jnp.zeros((1, 64, 64, 3), dtype), 1),
            "clip": clip.init(r2, jnp.zeros((1, 224, 224, 3), dtype)),
        }
        cn_params = cn.init(
            r3, jnp.zeros((1, 2, h, w, cn_cfg.in_channels), dtype),
            jnp.zeros(()),
            jnp.zeros((1, 1, cn_cfg.cross_attention_dim), dtype),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 2, h * 8, w * 8, 3), dtype))
        return frozen, cn_params

    frozen, cn_params = init_all()
    jax.block_until_ready(cn_params)
    cfg = TrainConfig(per_device_batch_size=b)

    def attempt(f_try, adam8=False):
        step, opt = make_controlnet_train_step(
            unet=unet, vae=vae, clip=clip, controlnet=cn,
            cfg=cfg.replace(use_8bit_adam=adam8),
            dtype=dtype)
        state = create_train_state(jax.tree.map(jnp.copy, cn_params), opt)
        rs = np.random.RandomState(0)
        batch = {
            "video": jax.device_put(
                (rs.rand(b, f_try, height, width, 3) * 2 - 1)
                .astype(np.float32), dev),
            "controlnet_cond": jax.device_put(
                rs.rand(b, f_try, h * 8, w * 8, 3).astype(np.float32), dev),
            "motion_values": jnp.full((b,), 127.0),
        }
        _set_phase(f"config5: compiling ControlNet train step F={f_try} "
                   "(long AOT)")
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
        loss0 = float(metrics["loss"])
        _set_phase(f"config5: compiled F={f_try}; first loss {loss0:.4f}; timing")
        t0 = time.perf_counter()
        reps = int(os.environ.get("TVI_BENCH_REPEATS", 3))
        for i in range(reps):
            state, metrics = step(state, frozen, batch,
                                  jax.random.PRNGKey(5 + i))
        _ = float(metrics["loss"])  # readback = sync through the tunnel
        return (time.perf_counter() - t0) / reps, loss0

    def try_once(f_try, a8):
        # catch-and-return so the failed attempt's traceback (which pins
        # the 4+ GB of params/optimizer state in its frames) is released
        # BEFORE the next attempt allocates — retrying inside the except
        # block OOM'd the fallback itself (measured r5)
        try:
            return attempt(f_try, a8), None
        except Exception as e:  # noqa: BLE001
            if not any(m in str(e).lower()
                       for m in ("memory", "resource", "exhausted")):
                raise
            return None, f"{type(e).__name__}"

    import gc

    note = None
    adam8 = bool(os.environ.get("TVI_BENCH_ADAM8"))
    # ladder of (frames, use_8bit_adam) fallbacks; fp32 Adam on the whole
    # 0.68B ControlNet is 10.8 GB of state next to 4.5 GB frozen models —
    # the reference 14f geometry needs 18.6 GB and cannot fit one 16 GB
    # chip (measured r5); the reference's own remedy is --use_8bit_adam
    # (src/train.py:392-397) -> tvi/train/adam8bit.py (-4 GB).
    plans = [(frames, adam8), (frames, True), (frames // 2, True),
             (frames // 4, True)]
    seen = set()
    res = None
    for f_try, a8 in plans:
        if (f_try, a8) in seen or f_try < 1:
            continue
        seen.add((f_try, a8))
        res, err = try_once(f_try, a8)
        gc.collect()
        if res is not None:
            if (f_try, a8) != plans[0]:
                note = (f"fallback engaged (first config OOM'd): F={f_try},"
                        f" use_8bit_adam={a8}")
            frames, adam8 = f_try, a8
            break
        _log(f"config5: F={f_try} adam8={a8} failed ({err}); next fallback")
    if res is None:
        raise RuntimeError("config5: every geometry fallback exhausted memory")
    t, loss0 = res
    _set_phase("done")
    opt_name = "AdamW8bit" if adam8 else "AdamW"
    result = {
        "metric": f"ControlNet train step ({frames}f {width}x{height},"
                  f" batch {b}, {opt_name}, first-frame cond)",
        "value": round(t, 4), "unit": "s/step", "vs_baseline": None,
        "loss_finite": bool(np.isfinite(loss0)), "device": str(dev)}
    if note:
        result["note"] = note
    print(json.dumps(result), flush=True)


_CONFIG_MAINS = {1: main_config1, 2: main_config2, 3: main_config3,
                 4: None, 5: main_config5}  # 4 = headline main()


# kill switches for the newest kernel generation (knob -> fallback value):
# if the default stack ever fails on real hardware (a fresh Mosaic construct
# the CPU interpret tests can't validate), the bench falls back to the
# previously chip-validated configuration instead of recording nothing.
# Mirror of __graft_entry__._probe_newest_kernels — keep the two in sync.
_SESSION4_KNOBS = {
    # v5 (+projin/GN folds) flipped to opt-in after the round-4 chip ladder
    # (+236 ms loss) — no longer in the default stack, so not listed here.
    "TVI_DISABLE_TEMPORAL_LN": "1",
    "TVI_DISABLE_TEMPORAL_FFIN": "1", "TVI_DISABLE_CROSS_FF": "1",
    "TVI_TEMPORAL_INKERNEL_PAD": "0", "TVI_DISABLE_ATTN_PACKED": "1",
    # round-4 session-4 default flips: transposed-IO temporal kernels
    # (chip-gated + unet_fwd −17 ms; TPU-gated default in
    # tvi/ops/attention.py::temporal_4d_enabled) and the LN+QKV+split
    # streaming kernel feeding the split spatial-attention path
    "TVI_TEMPORAL_4D": "0",
    "TVI_DISABLE_QKV_LN": "1",
    # round-4 session-7/8 default flip: GN-affine + proj_in prologue on the
    # ln_qkv_split streaming kernel (chip A/B −19.4 ms/fwd)
    "TVI_DISABLE_QKV_PROJIN": "1",
}

# A backend-init / tunnel failure is not fixable by any kernel knob; flipping
# knobs there just doubles the cost under a fixed timeout (this is what
# burned BENCH_r03).  Fail fast instead.
_BACKEND_ERR_MARKERS = (
    "Unable to initialize backend", "UNAVAILABLE", "DEADLINE_EXCEEDED",
    "failed to connect", "Connection reset", "Socket closed",
    "No visible", "backend 'axon'",
)


def _is_backend_error(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in _BACKEND_ERR_MARKERS)


def _watchdog(frames: int, steps: int, width: int, height: int) -> None:
    """Daemon thread: heartbeat breadcrumbs every 2 min, and at the deadline
    (default 1200 s — safely inside the driver's >=30 min kill window, r3
    evidence) emits a diagnostic JSON to stdout so a timeout still records
    the phase reached + any partial measurement.  The run keeps going; later
    JSON lines supersede this one."""
    deadline = float(os.environ.get("TVI_BENCH_DEADLINE_S", 1200))
    fired = False
    while True:
        time.sleep(30)
        if _STATE.get("phase") == "done":
            return
        elapsed = time.time() - _T0
        if int(elapsed) % 120 < 30:
            _log(f"heartbeat: phase={_STATE.get('phase')}")
        if not fired and elapsed >= deadline:
            fired = True
            _log(f"deadline {deadline:.0f}s reached — emitting diagnostic "
                 "JSON (run continues)")
            print(json.dumps(_partial_json(frames, steps, width, height)),
                  flush=True)


if __name__ == "__main__":
    _config = 4
    if "--config" in sys.argv:
        _config = int(sys.argv[sys.argv.index("--config") + 1])
    _main = _CONFIG_MAINS.get(_config) or main
    _wd = threading.Thread(
        target=_watchdog,
        args=(int(os.environ.get("TVI_BENCH_FRAMES", 25)),
              int(os.environ.get("TVI_BENCH_STEPS", 25)),
              int(os.environ.get("TVI_BENCH_WIDTH", 1024)),
              int(os.environ.get("TVI_BENCH_HEIGHT", 576))),
        daemon=True)
    _wd.start()
    _set_phase("dialing tunnel (jax.devices, ~60 s typical)")
    try:
        jax.devices()  # dial the tunnel FIRST: init failures exit here fast
    except Exception as e:  # noqa: BLE001
        print(f"[bench] backend init failed ({type(e).__name__}: {e}); "
              "no kernel configuration can fix this — aborting",
              file=sys.stderr)
        sys.exit(3)
    _set_phase("tunnel up")
    try:
        _main()
    except Exception as e:  # noqa: BLE001 — kernel failures: retry conservative
        if _is_backend_error(e):
            print(f"[bench] backend/tunnel error mid-run "
                  f"({type(e).__name__}: {e}); not a kernel problem — "
                  "aborting without the knob-flip recompile", file=sys.stderr)
            raise
        print(f"[bench] default config failed ({type(e).__name__}: {e}); "
              "retrying with the newest kernels disabled", file=sys.stderr)
        for k, v in _SESSION4_KNOBS.items():
            os.environ[k] = v
        _main()
