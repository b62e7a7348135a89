"""Two-frame video interpolation pipeline (Framer on SVD), TPU-native.

Rebuild of ``StableVideoDiffusionEfficientInterpPipeline``
(pipeline_stable_video_diffusion_efficient_interp.py:159-597) plus the
ControlNet surface of the missing
``StableVideoDiffusionInterpControlPipeline`` (kwargs reconstructed from
src/test.py:592-617 / src/app_org.py:455-476).

TPU-first design (differs from the reference's per-step Python loop on
purpose):
  - the entire denoise loop is ONE jitted ``lax.fori_loop`` program —
    scheduler math, CFG combine and UNet call all fuse into a single XLA
    executable; no host<->device traffic per step;
  - CFG runs as a batched pair (uncond/cond stacked on the batch axis), so
    the MXU sees batch 2B instead of two launches;
  - VAE decode is chunked with a static chunk size via ``lax.map``
    (reference decode_chunk_size, pipeline:282-308);
  - everything is NHWC bf16 with fp32 scheduler math.

The compiled program is cached per static shape key (F, H, W, steps,
control on/off), mirroring SURVEY §7.3.3.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tvi.core.config import PipelineConfig
from tvi.diffusion.euler import EulerDiscreteScheduler
from tvi.diffusion.guidance import frame_guidance_scale
from tvi.models.clip_vision import clip_normalize
from tvi.ops.resize import resize_with_antialiasing
from tvi.pipelines.conditioning import (
    CondAblations,
    assemble_conditioning_latents,
    assemble_context,
    assemble_first_frame_conditioning,
)
from tvi.utils.images import postprocess_frames, to_vae_range


@dataclass
class InterpolationPipeline:
    """Bundles models + params; callable like the reference pipeline."""

    unet: Any
    unet_params: Any
    vae: Any
    vae_params: Any
    clip: Any
    clip_params: Any
    mask_token: jax.Array                      # (4,)
    scheduler: EulerDiscreteScheduler = field(default_factory=EulerDiscreteScheduler)
    projector: Any = None
    projector_params: Any = None
    controlnet: Any = None
    controlnet_params: Any = None
    dtype: Any = jnp.bfloat16
    # optional multi-chip serving mesh: the CFG pair rides the 'data' axis,
    # latent height the 'model' axis (XLA partitions convs with halo
    # exchanges and all-gathers attention K/V over ICI) — the whole jitted
    # denoise fori-loop and the chunked decode run SPMD, not just one
    # forward (tvi/parallel/inference_sharding.py documents the layout)
    mesh: Any = None

    def _mesh_shardings(self, do_cfg: bool, batch: int = 2):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tvi.parallel.mesh import DATA_AXIS, MODEL_AXIS

        mesh = self.mesh
        repl = NamedSharding(mesh, P())
        data_n = mesh.shape.get(DATA_AXIS, 1)
        # the CFG pair rides 'data' only when it divides (serving one video
        # means batch 2 — use a (2, N) data x model mesh to engage both axes)
        batch_ax = DATA_AXIS if (do_cfg and batch % data_n == 0) else None
        return {
            "repl": repl,
            # (B, F, h, w, C) video latents: un-CFG'd input latents shard
            # height only; CFG-doubled tensors shard batch on 'data' too
            "lat": NamedSharding(mesh, P(None, None, MODEL_AXIS, None, None)),
            "pair": NamedSharding(mesh, P(batch_ax, None, MODEL_AXIS, None, None)),
            "ctx": NamedSharding(mesh, P(batch_ax, None, None)),
            "ids": NamedSharding(mesh, P(batch_ax, None)),
        }

    def controlnet_cond_size(self, height: int, width: int):
        """Resolution the ControlNet conditioning video must have: 8x the
        latent grid (its embedding downsamples 8x, controlnet_svd.py:81-91).
        Equals (height, width) for the real 8x VAE."""
        vsf = self.vae.config.downscale_factor
        return (height // vsf) * 8, (width // vsf) * 8

    # ----------------------------------------------------------------- CLIP
    def encode_image(self, image01: jax.Array) -> jax.Array:
        """[0,1] NHWC -> (B, 1, 1024) image embeds.  Reproduces the
        reference CLIP path exactly (pipeline:190-216): to [-1,1], antialiased
        224 resize, back to [0,1], CLIP-normalize, encode."""
        x = to_vae_range(image01)
        size = self.clip.config.image_size  # 224 for ViT-H (pipeline:199)
        x = resize_with_antialiasing(jnp.asarray(x, jnp.float32), (size, size))
        x = (x + 1.0) / 2.0
        x = clip_normalize(x)
        emb = self.clip.apply(self.clip_params, x.astype(self.dtype))
        return emb[:, None, :]

    # ------------------------------------------------------------- main call
    def __call__(
        self,
        image01: np.ndarray,        # (B, H, W, 3) in [0,1]
        image_end01: np.ndarray,
        rng: jax.Array,
        config: PipelineConfig = PipelineConfig(),
        ablations: CondAblations = CondAblations(),
        controlnet_cond: Optional[np.ndarray] = None,  # (B, F, H, W, 3) heatmaps in [0,1]
        do_motion_prompt: bool = False,
        use_temporal_attention_bias: bool = False,
        collect_attn_stats: bool = False,
        sift_track_update: bool = False,
        point_tracks: Optional[np.ndarray] = None,       # (F, N, 2) cond-res
        anchor_points_flag: Optional[np.ndarray] = None,  # (N,) bool
        track_update_interval: int = 5,
        output_type: str = "np",
        init_noise: Optional[np.ndarray] = None,   # (B, F, h, w, 4) pre-scale
        aug_noise: Optional[Tuple] = None,         # (first, end) image-space
    ):
        """``init_noise``/``aug_noise`` inject explicit noise arrays in
        place of the rng draws — the reference pipeline's ``latents=``
        kwarg (pipeline:495-504: injected noise is still scaled by
        init_noise_sigma) and the deterministic hook the assembled-pipeline
        oracle test uses to run both pipelines on identical noise."""
        cfg = config
        b = image01.shape[0]
        vsf = self.vae.config.downscale_factor
        h_lat, w_lat = cfg.height // vsf, cfg.width // vsf
        do_cfg = cfg.max_guidance_scale > 1.0

        rng, r_noise, r_aug1, r_aug2 = jax.random.split(rng, 4)
        image01 = jnp.asarray(image01, jnp.float32)
        if image_end01 is not None:  # unused in 'first_frame' mode
            image_end01 = jnp.asarray(image_end01, jnp.float32)

        first_frame_mode = cfg.conditioning_mode == "first_frame"

        # 3. CLIP embeds (+CFG zeros prepended, pipeline:222-227)
        emb_first = self.encode_image(image01).astype(self.dtype)
        if do_cfg:
            emb_first = jnp.concatenate([jnp.zeros_like(emb_first), emb_first])
        if not first_frame_mode:
            emb_end = self.encode_image(image_end01).astype(self.dtype)
            if do_cfg:
                emb_end = jnp.concatenate([jnp.zeros_like(emb_end), emb_end])

        projector_fn = None
        if self.projector is not None:
            projector_fn = lambda x: self.projector.apply(self.projector_params, x)
        if first_frame_mode:
            # plain single-token SVD context (train_svd.py:1147-1150)
            ctx = emb_first
        else:
            ctx = assemble_context(emb_first, emb_end, projector_fn,
                                   do_motion_prompt=do_motion_prompt,
                                   ablations=ablations)

        # 4. VAE conditioning latents with noise aug (pipeline:456-476)
        pix_first = to_vae_range(image01)
        noise_first = (jnp.asarray(aug_noise[0], pix_first.dtype)
                       if aug_noise is not None else jax.random.normal(
                           r_aug1, pix_first.shape, dtype=pix_first.dtype))
        pix_first = pix_first + cfg.noise_aug_strength * noise_first
        lat_first = self.vae.apply(self.vae_params, pix_first,
                                   method=self.vae.encode_mode).astype(self.dtype)
        if do_cfg:  # zero latents as the uncond row (pipeline:239-246)
            lat_first = jnp.concatenate([jnp.zeros_like(lat_first), lat_first])

        if first_frame_mode:
            # 8-channel layout: repeated first-frame latent, no mask channel
            image_latents = assemble_first_frame_conditioning(
                lat_first, cfg.num_frames)
        else:
            pix_end = to_vae_range(image_end01)
            noise_end = (jnp.asarray(aug_noise[1], pix_end.dtype)
                         if aug_noise is not None else jax.random.normal(
                             r_aug2, pix_end.shape, dtype=pix_end.dtype))
            pix_end = pix_end + cfg.noise_aug_strength * noise_end
            lat_end = self.vae.apply(self.vae_params, pix_end,
                                     method=self.vae.encode_mode).astype(self.dtype)
            if do_cfg:
                lat_end = jnp.concatenate([jnp.zeros_like(lat_end), lat_end])
            image_latents = assemble_conditioning_latents(
                lat_first, lat_end, self.mask_token, cfg.num_frames, ablations)

        # 5. added time ids, fps-1 convention (pipeline:452,479-487)
        ids = jnp.asarray([[cfg.fps - 1, cfg.motion_bucket_id,
                            cfg.noise_aug_strength]], jnp.float32)
        added_time_ids = jnp.broadcast_to(ids, (b, 3))
        if do_cfg:
            added_time_ids = jnp.concatenate([added_time_ids, added_time_ids])

        # 6. schedule + init noise
        sigmas, timesteps = self.scheduler.set_timesteps(cfg.num_inference_steps)
        latents = (jnp.asarray(init_noise, jnp.float32)
                   if init_noise is not None else jax.random.normal(
                       r_noise, (b, cfg.num_frames, h_lat, w_lat, 4),
                       dtype=jnp.float32))
        latents = (latents * self.scheduler.init_noise_sigma).astype(self.dtype)

        # 7. per-frame guidance (pipeline:523-532)
        guidance = frame_guidance_scale(cfg.num_frames, cfg.min_guidance_scale,
                                        cfg.max_guidance_scale, cfg.middle_max_guidance)

        with_control = (self.controlnet is not None and controlnet_cond is not None
                        and cfg.with_control)
        cn_cond = None
        cn_params = self.controlnet_params
        if with_control:
            cn_cond = jnp.asarray(controlnet_cond, self.dtype)
            if do_cfg:
                cn_cond = jnp.concatenate([cn_cond, cn_cond])

        use_stepped = collect_attn_stats or (sift_track_update and with_control)
        if use_stepped:
            track_state = None
            if sift_track_update and with_control and point_tracks is not None:
                track_state = {"tracks": np.asarray(point_tracks, np.float32),
                               "anchor_flags": anchor_points_flag,
                               "interval": track_update_interval}
            latents, attn_records = self._denoise_with_stats(
                latents, image_latents, ctx, added_time_ids, sigmas,
                timesteps, guidance, cn_cond, do_cfg, with_control,
                cfg.num_inference_steps, float(cfg.controlnet_cond_scale),
                cfg.controlnet_step_range, use_temporal_attention_bias,
                track_state=track_state)
        else:
            attn_records = None
            latents = self._denoise(
                self.unet_params, cn_params, latents, image_latents, ctx,
                added_time_ids, sigmas, timesteps, guidance, cn_cond,
                do_cfg, with_control, cfg.num_inference_steps,
                float(cfg.controlnet_cond_scale),
                cfg.controlnet_step_range, use_temporal_attention_bias,
            )

        if output_type == "latent":
            return (latents, attn_records) if collect_attn_stats else latents
        frames = self.decode_latents(latents, cfg.num_frames, cfg.decode_chunk_size)
        if output_type == "np":
            frames = postprocess_frames(np.asarray(frames, np.float32).reshape(
                (-1,) + frames.shape[2:])).reshape(
                    (b, cfg.num_frames) + frames.shape[2:])
        return (frames, attn_records) if collect_attn_stats else frames

    # ---------------------------------------- analysis loop (jitted steps)
    def _denoise_with_stats(self, latents, image_latents, ctx, added_time_ids,
                            sigmas, timesteps, guidance, cn_cond,
                            do_cfg: bool, with_control: bool, num_steps: int,
                            cond_scale: float, step_range, use_bias: bool,
                            track_state: Optional[dict] = None):
        """Python-stepped denoise that collects per-layer AttnStats each
        step — the functional replacement for the reference's CSV-dumping
        attention monkey-patch (src/test.py:112-480).  The loop stays in
        Python (host-side SIFT re-tracking between steps needs the feature
        maps on host), but each step is ONE jitted program (controlnet +
        UNet + CFG + scheduler), cached per shape key, so analysis runs pay
        a single device round-trip per step instead of eager dispatch.

        ``track_state`` enables ``sift_track_update`` (the missing ControlNet
        pipeline's flag, surface at src/test.py:605; RECONSTRUCTED semantics):
        between denoise steps, re-track each control point on the UNet's
        highest-resolution intermediate features (tvi.control.tracks.
        point_tracking = reference sift_match.py:203), PCHIP-smooth the
        updated trajectory, re-render the heatmap video.  Keys:
        {'tracks': (F, N, 2) at cond resolution, 'anchor_flags': optional
        (N,) bool — anchored points are never moved, 'interval': int}.
        """
        from flax import traverse_util

        guidance_b = guidance[None, :, None, None, None].astype(jnp.float32)
        lo = int(step_range[0] * num_steps)
        hi = int(step_range[1] * num_steps)
        step_fn = self._stats_step_fn(latents.shape, do_cfg, with_control,
                                      use_bias, isinstance(ctx, tuple))
        records = []
        for i in range(num_steps):
            scale_i = jnp.float32(cond_scale if lo <= i < hi else 0.0)
            latents, intermediates, last_feat = step_fn(
                self.unet_params, self.controlnet_params, latents,
                image_latents, ctx, added_time_ids, sigmas[i], sigmas[i + 1],
                timesteps[i], guidance_b, cn_cond, scale_i)
            flat = traverse_util.flatten_dict(intermediates, sep="/")
            records.append({
                k.replace("/attn_stats", ""): tuple(np.asarray(s) for s in v[0])
                for k, v in flat.items()})

            if (with_control and track_state is not None
                    and (i + 1) % track_state.get("interval", 5) == 0
                    and i + 1 < num_steps):
                cn_cond = self._update_tracks_and_heatmaps(
                    last_feat, track_state, cn_cond, do_cfg)
        return latents, records

    def _stats_step_fn(self, latents_shape, do_cfg: bool, with_control: bool,
                       use_bias: bool, tuple_ctx: bool):
        """One denoise step (controlnet + UNet w/ attention stats + CFG +
        scheduler) as a single cached jitted program."""
        key = ("stats_step", latents_shape, do_cfg, with_control, use_bias,
               tuple_ctx)
        fn = self._jit_cache_get(key)
        if fn is not None:
            return fn

        @jax.jit
        def step(unet_params, cn_params, latents, image_latents, ctx,
                 added_time_ids, sigma, sigma_next, t, guidance_b, cn_cond,
                 scale_i):
            x = jnp.concatenate([latents] * 2) if do_cfg else latents
            x = self.scheduler.scale_model_input(x, sigma).astype(self.dtype)
            x_in = jnp.concatenate([x, image_latents.astype(self.dtype)], axis=-1)
            down_res = mid_res = None
            if with_control:
                down_res, mid_res = self.controlnet.apply(
                    cn_params, x_in, t, ctx, added_time_ids, cn_cond, scale_i)
            (noise_pred, feats), state = self.unet.apply(
                unet_params, x_in, t, ctx, added_time_ids,
                down_block_residuals=down_res, mid_block_residual=mid_res,
                use_temporal_attention_bias=use_bias, want_stats=True,
                mutable=["intermediates"])
            noise_pred = noise_pred.astype(jnp.float32)
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_b * (cond - uncond)
            new_latents = self.scheduler.step(
                noise_pred, latents.astype(jnp.float32),
                sigma, sigma_next).astype(latents.dtype)
            return new_latents, state["intermediates"], feats[-1]

        self._jit_cache_put(key, step)
        return step

    def _update_tracks_and_heatmaps(self, feat, track_state: dict,
                                    cn_cond, do_cfg: bool):
        """sift_track_update core (reconstructed): re-localize each point on
        the UNet's final up-block features, smooth, re-render heatmaps."""
        from tvi.control.heatmap import render_heatmap_video
        from tvi.control.tracks import interpolate_trajectory, point_tracking

        tracks = track_state["tracks"]                 # (F, N, 2) cond-res xy
        num_frames, n_pts = tracks.shape[:2]
        # cond half of the CFG batch, frame-major: (F, h, w, C) -> (F, C, h, w)
        f = feat[feat.shape[0] // 2:] if do_cfg else feat
        f = jnp.moveaxis(f, -1, 1).astype(jnp.float32)
        fh, fw = f.shape[2], f.shape[3]
        cond_h, cond_w = cn_cond.shape[2], cn_cond.shape[3]
        to_feat = np.asarray([fw / cond_w, fh / cond_h], np.float32)

        new_tracks = tracks.copy()
        init_pts = jnp.asarray(tracks[0] * to_feat)
        for fr in range(1, num_frames):
            cur = jnp.asarray(tracks[fr] * to_feat)
            upd = np.asarray(point_tracking(f[0], f[fr], cur, init_pts,
                                            track_dist=2))
            new_tracks[fr] = upd / to_feat
        anchors = track_state.get("anchor_flags")
        if anchors is not None:
            new_tracks[:, anchors] = tracks[:, anchors]
        # PCHIP smooth over frames (the reference imports
        # interpolate_trajectory into the pipeline for exactly this);
        # knot selection always includes frame 0 and the final keyframe
        knots = np.unique(np.linspace(0, num_frames - 1, 4).round().astype(int))
        new_tracks = interpolate_trajectory(new_tracks[knots], num_frames)
        track_state["tracks"] = new_tracks
        heat = render_heatmap_video(new_tracks, cond_w, cond_h)[None]
        heat = jnp.asarray(heat, self.dtype)
        return jnp.concatenate([heat, heat]) if do_cfg else heat

    # --------------------------------------------------------- denoise loop
    def _denoise(self, unet_params, cn_params, latents, image_latents, ctx,
                 added_time_ids, sigmas, timesteps, guidance, cn_cond,
                 do_cfg: bool, with_control: bool, num_steps: int,
                 cond_scale: float, step_range: Tuple[float, float],
                 use_temporal_attention_bias: bool):
        key = ("denoise", latents.shape, do_cfg, with_control, num_steps,
               step_range, use_temporal_attention_bias,
               isinstance(ctx, tuple), self.mesh)
        fn = self._jit_cache_get(key)
        if fn is None:
            lo = int(step_range[0] * num_steps)
            hi = int(step_range[1] * num_steps)
            sh = (self._mesh_shardings(do_cfg, image_latents.shape[0])
                  if self.mesh is not None else None)

            def run(unet_params, cn_params, latents, image_latents, ctx,
                    added_time_ids, sigmas, timesteps, guidance, cn_cond,
                    cond_scale):
                guidance_b = guidance[None, :, None, None, None].astype(jnp.float32)

                def body(i, latents):
                    sigma, sigma_next, t = sigmas[i], sigmas[i + 1], timesteps[i]
                    x = jnp.concatenate([latents] * 2) if do_cfg else latents
                    x = self.scheduler.scale_model_input(x, sigma).astype(self.dtype)
                    x_in = jnp.concatenate([x, image_latents.astype(self.dtype)], axis=-1)
                    if sh is not None:
                        # pin the CFG pair to 'data' and latent height to
                        # 'model' for the whole loop body
                        x_in = jax.lax.with_sharding_constraint(x_in, sh["pair"])

                    down_res = mid_res = None
                    if with_control:
                        # ControlNet active only inside controlnet_step_range
                        # (reconstructed kwarg, test.py:599); the controlnet
                        # consumes the full 9-channel input like the UNet
                        # (train_decouples.py:956-976)
                        scale_i = jnp.where((i >= lo) & (i < hi), cond_scale, 0.0)
                        down_res, mid_res = self.controlnet.apply(
                            cn_params, x_in, t, ctx, added_time_ids,
                            cn_cond, scale_i)

                    noise_pred, _ = self.unet.apply(
                        unet_params, x_in, t, ctx, added_time_ids,
                        down_block_residuals=down_res,
                        mid_block_residual=mid_res,
                        use_temporal_attention_bias=use_temporal_attention_bias)
                    noise_pred = noise_pred.astype(jnp.float32)

                    if do_cfg:
                        uncond, cond = jnp.split(noise_pred, 2, axis=0)
                        noise_pred = uncond + guidance_b * (cond - uncond)

                    return self.scheduler.step(
                        noise_pred, latents.astype(jnp.float32),
                        sigma, sigma_next).astype(latents.dtype)

                return jax.lax.fori_loop(0, num_steps, body, latents)

            if sh is not None:
                fn = jax.jit(
                    run, donate_argnums=(2,),
                    in_shardings=(sh["repl"], sh["repl"], sh["lat"],
                                  sh["pair"],
                                  (sh["ctx"], sh["ctx"]) if isinstance(ctx, tuple)
                                  else sh["ctx"],
                                  sh["ids"], sh["repl"], sh["repl"],
                                  sh["repl"], sh["pair"] if cn_cond is not None
                                  else sh["repl"], sh["repl"]),
                    out_shardings=sh["lat"])
            else:
                fn = jax.jit(run, donate_argnums=(2,))
            self._jit_cache_put(key, fn)
        return fn(unet_params, cn_params, latents, image_latents, ctx,
                  added_time_ids, sigmas, timesteps, guidance, cn_cond,
                  cond_scale)

    # --------------------------------------------------------------- decode
    def decode_latents(self, latents: jax.Array, num_frames: int,
                       decode_chunk_size: Optional[int] = None) -> jax.Array:
        """(B, F, h, w, 4) -> (B, F, H, W, 3) in [-1,1]; chunked decode like
        pipeline:282-308."""
        key = ("decode", latents.shape, num_frames, decode_chunk_size, self.mesh)
        fn = self._jit_cache_get(key)
        if fn is None:
            chunk_sh = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from tvi.parallel.mesh import DATA_AXIS, MODEL_AXIS

                chunk = decode_chunk_size or num_frames
                data_n = self.mesh.shape.get(DATA_AXIS, 1)
                frame_ax = DATA_AXIS if chunk % data_n == 0 else None
                # frames of a chunk over 'data', pixel height over 'model'
                chunk_sh = NamedSharding(
                    self.mesh, P(frame_ax, MODEL_AXIS, None, None))

            def run(vae_params, latents):
                b = latents.shape[0]
                z = latents.astype(jnp.float32) / self.vae.config.scaling_factor
                z = z.reshape((b * num_frames,) + z.shape[2:])
                chunk = decode_chunk_size or num_frames
                n = z.shape[0]
                n_full = (n // chunk) * chunk

                def dec(c):
                    if chunk_sh is not None:
                        c = jax.lax.with_sharding_constraint(c, chunk_sh)
                    return self.vae.apply(vae_params, c, c.shape[0],
                                          method=self.vae.decode)

                if n_full >= chunk and n_full > 0 and chunk < n:
                    zc = z[:n_full].reshape((n_full // chunk, chunk) + z.shape[1:])
                    frames = jax.lax.map(dec, zc)
                    frames = frames.reshape((n_full,) + frames.shape[2:])
                    if n_full < n:  # ragged tail decoded as its own chunk
                        tail = self.vae.apply(vae_params, z[n_full:],
                                              n - n_full, method=self.vae.decode)
                        frames = jnp.concatenate([frames, tail], axis=0)
                else:
                    frames = dec(z)
                return frames.reshape(
                    (b, num_frames) + frames.shape[1:]).astype(jnp.float32)

            fn = jax.jit(run)
            self._jit_cache_put(key, fn)
        return fn(self.vae_params, latents)

    # ------------------------------------------------------ jit fn caching
    def _jit_cache_get(self, key):
        if not hasattr(self, "_jit_cache"):
            object.__setattr__(self, "_jit_cache", {})
        return self._jit_cache.get(key)

    def _jit_cache_put(self, key, fn):
        self._jit_cache[key] = fn
