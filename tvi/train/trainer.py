"""Training steps for the three reference trainers (SURVEY §2.3), built
TPU-first.

- ``make_interp_train_step`` covers src/train.py (temporal-blocks +
  projector training with EDM loss) AND src/train_decouples.py (adds motion
  encoder, attention-monotonicity loss, temporal attention bias, optional
  ControlNet branch) via TrainConfig flags.
- ``make_controlnet_train_step`` covers svd-temporal-controlnet/train_svd.py
  (whole-ControlNet training with first-frame conditioning, conditioning
  dropout for CFG, per-sample motion buckets).

TPU-native distribution (replacing accelerate/NCCL DDP, SURVEY §2.6): the
step is jitted over a ``jax.sharding.Mesh`` with the batch sharded along the
``data`` axis and parameters/optimizer state replicated; XLA inserts the
gradient psum over ICI.  Gradient accumulation is an in-step ``lax.scan``
over microbatches.  Gradients and optimizer state exist only for the
trainable partition (tvi.train.params).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvi.core.config import TrainConfig
from tvi.diffusion.edm import EDMConstants, rand_cosine_interpolated, sigma_to_timestep
from tvi.diffusion.edm import edm_preconditioning
from tvi.models.clip_vision import clip_normalize
from tvi.ops.resize import resize_with_antialiasing
from tvi.parallel.mesh import DATA_AXIS
from tvi.pipelines.conditioning import assemble_conditioning_latents, assemble_context
from tvi.train.losses import attention_monotonicity_loss, edm_mse_loss, frame_matching_loss
from tvi.train.params import merge_params


def conditioning_dropout_masks(rng: jax.Array, b: int, p: float):
    """CFG conditioning-dropout keep masks (train_svd.py:1164-1184).

    One uniform ``random_p`` per sample drives BOTH masks (correlated
    bands, InstructPix2Pix §3.2.1): prompt dropped iff ``random_p < 2p``,
    image dropped iff ``p <= random_p < 3p``.  Returns fp32
    ``(prompt_keep, image_keep)`` of shape (b,) with 1.0 = keep.
    """
    random_p = jax.random.uniform(rng, (b,))
    prompt_keep = (random_p >= 2 * p).astype(jnp.float32)
    image_keep = 1.0 - ((random_p >= p) & (random_p < 3 * p)).astype(jnp.float32)
    return prompt_keep, image_keep


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    trainable: Any          # trainable param subset (fp32)
    opt_state: Any
    ema: Optional[Any] = None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW matching src/train.py:411-418 (+ global-norm clip, the
    accelerate default the launchers rely on).  ``cfg.use_8bit_adam``
    selects the blockwise int8-moment variant (reference --use_8bit_adam,
    src/train.py:392-397; tvi/train/adam8bit.py)."""
    lr = (optax.schedules.warmup_constant_schedule(
        0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        if cfg.lr_warmup_steps > 0 else cfg.learning_rate)
    if cfg.use_8bit_adam:
        from tvi.train.adam8bit import adamw_8bit

        inner = adamw_8bit(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           weight_decay=cfg.adam_weight_decay,
                           eps=cfg.adam_epsilon)
    else:
        inner = optax.adamw(
            learning_rate=lr,
            b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            weight_decay=cfg.adam_weight_decay, eps=cfg.adam_epsilon)
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), inner)


def create_train_state(trainable, optimizer, use_ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        ema=jax.tree.map(jnp.copy, trainable) if use_ema else None,
    )


def _encode_clip_embeddings(clip, clip_params, pixels_m11, dtype):
    """[-1,1] frames -> (B, 1, 1024) embeds, reproducing the dataset-side
    CLIP encode (SURVEY §2.4: computed inside the dataset with the passed
    encoder; here fused into the jitted step — same math, no host round
    trip)."""
    size = clip.config.image_size
    x = resize_with_antialiasing(pixels_m11.astype(jnp.float32), (size, size))
    x = clip_normalize((x + 1.0) / 2.0)
    return clip.apply(clip_params, x.astype(dtype))[:, None, :]


def make_interp_train_step(
    *,
    unet,
    vae,
    clip,
    projector,
    cfg: TrainConfig,
    motion_encoder=None,
    controlnet=None,
    mesh: Optional[Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    dtype=jnp.bfloat16,
):
    """Returns (step_fn, optimizer).  step_fn(state, frozen, batch, rng) ->
    (state, metrics).

    frozen: dict with 'unet' (frozen subset), 'vae', 'clip', 'mask_token',
    optionally 'controlnet'.
    trainable (inside state): dict with 'unet' (temporal subset),
    'projector', optionally 'motion_encoder'.

    batch: 'video' (B,F,H,W,3) in [-1,1]; 'first'/'end' (B,H,W,3) in [-1,1];
    decoupled variant adds 'motion_first'/'motion_end' (B,h,w,1).
    """
    optimizer = optimizer or make_optimizer(cfg)
    edm = EDMConstants(cfg.sigma_min_value, cfg.sigma_max_value, cfg.image_d,
                       cfg.noise_d_low, cfg.noise_d_high, cfg.sigma_data)

    def loss_fn(trainable, frozen, batch, rng):
        r_sigma, r_noise, r_vae, r_aug1, r_aug2 = jax.random.split(rng, 5)
        unet_params = merge_params(trainable["unet"], frozen["unet"])
        video = batch["video"]
        b, f = video.shape[0], video.shape[1]

        # 1. video -> latents (train.py:481-489: sample() * scaling)
        flat = video.reshape((b * f,) + video.shape[2:]).astype(dtype)
        latents = vae.apply(frozen["vae"], flat, r_vae, method=vae.encode_sample)
        latents = (latents * vae.config.scaling_factor).astype(jnp.float32)
        latents = latents.reshape((b, f) + latents.shape[1:])

        # 2. EDM noising (train.py:520-531)
        sigmas = rand_cosine_interpolated(r_sigma, (b,), edm)
        s = sigmas.reshape(b, 1, 1, 1, 1)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy = latents + noise * s
        timesteps = sigma_to_timestep(sigmas)
        c_in, _, _ = edm_preconditioning(s)
        inp = (noisy * c_in).astype(dtype)

        # 3. conditioning latents (train.py:536-557); noise aug on the
        # conditioning frames (cond_noise_aug_strength, train.py:568-570)
        first = batch["first"].astype(jnp.float32)
        end = batch["end"].astype(jnp.float32)
        first = first + cfg.cond_noise_aug_strength * jax.random.normal(r_aug1, first.shape)
        end = end + cfg.cond_noise_aug_strength * jax.random.normal(r_aug2, end.shape)
        lat_first = vae.apply(frozen["vae"], first.astype(dtype), method=vae.encode_mode)
        lat_end = vae.apply(frozen["vae"], end.astype(dtype), method=vae.encode_mode)
        # decouples uses zeros instead of the mask token (train_decouples.py:881)
        mask_tok = frozen["mask_token"] if cfg.mask_token_conditioning else jnp.zeros((4,))
        image_latents = assemble_conditioning_latents(lat_first, lat_end, mask_tok, f)

        # 4. CLIP context + projector (train.py:561-566)
        emb_first = _encode_clip_embeddings(clip, frozen["clip"], batch["first"], dtype)
        emb_end = _encode_clip_embeddings(clip, frozen["clip"], batch["end"], dtype)
        if motion_encoder is not None and "motion_first" in batch:
            # decoupled variant: motion embeddings add to the CLIP tokens
            # (train_decouples.py:903-908)
            m1 = motion_encoder.apply(trainable["motion_encoder"],
                                      batch["motion_first"].astype(dtype))[:, None, :]
            m2 = motion_encoder.apply(trainable["motion_encoder"],
                                      batch["motion_end"].astype(dtype))[:, None, :]
            emb_first = emb_first + m1
            emb_end = emb_end + m2
        ctx = assemble_context(
            emb_first, emb_end,
            projector_fn=lambda x: projector.apply(trainable["projector"], x),
            do_motion_prompt=True)

        ids = jnp.asarray([[cfg.cond_fps, cfg.cond_motion_bucket_id,
                            cfg.cond_noise_aug_strength]], jnp.float32)
        added_time_ids = jnp.broadcast_to(ids, (b, 3))

        x_in = jnp.concatenate([inp, image_latents.astype(dtype)], axis=-1)

        down_res = mid_res = None
        if controlnet is not None and "controlnet_cond" in batch:
            down_res, mid_res = controlnet.apply(
                frozen["controlnet"], x_in, timesteps, ctx, added_time_ids,
                batch["controlnet_cond"].astype(dtype), 1.0)

        want_stats = cfg.use_monotonicity_loss
        out = unet.apply(
            unet_params, x_in, timesteps, ctx, added_time_ids,
            down_block_residuals=down_res, mid_block_residual=mid_res,
            use_temporal_attention_bias=cfg.use_attention_mask,
            want_stats=want_stats,
            mutable=["intermediates"] if want_stats else False)
        if want_stats:
            (model_pred, _), aux_state = out
        else:
            model_pred, _ = out

        loss = edm_mse_loss(model_pred, noisy, latents, sigmas)
        metrics = {"mse_loss": loss}
        if cfg.frame_matching:
            fm = frame_matching_loss(model_pred, noisy, latents, sigmas)
            loss = loss + fm
            metrics["frame_matching_loss"] = fm
        if want_stats:
            mono = attention_monotonicity_loss(aux_state["intermediates"])
            loss = loss + cfg.lambda_attn * mono
            metrics["monotonicity_loss"] = mono
        metrics["loss"] = loss
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, frozen, batch, rng):
        if cfg.gradient_accumulation_steps > 1:
            # batch leading axis = (accum, micro_batch, ...)
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, r = xs
                (loss, metrics), grads = grad_fn(state.trainable, frozen, mb, r)
                return (jax.tree.map(jnp.add, grads_acc, grads),
                        loss_acc + loss), metrics
            rngs = jax.random.split(rng, cfg.gradient_accumulation_steps)
            zero = jax.tree.map(jnp.zeros_like, state.trainable)
            (grads, _), metrics = jax.lax.scan(micro, (zero, 0.0), (batch, rngs))
            grads = jax.tree.map(lambda g: g / cfg.gradient_accumulation_steps, grads)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
        else:
            (_, metrics), grads = grad_fn(state.trainable, frozen, batch, rng)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        ema = state.ema
        if ema is not None:
            ema = optax.incremental_update(trainable, ema, 1.0 - cfg.ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, trainable=trainable,
                          opt_state=opt_state, ema=ema), metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(None, DATA_AXIS)) \
            if cfg.gradient_accumulation_steps > 1 else NamedSharding(mesh, P(DATA_AXIS))
        step_jit = jax.jit(
            train_step,
            in_shardings=(repl, repl, batch_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    else:
        step_jit = jax.jit(train_step, donate_argnums=(0,))
    return step_jit, optimizer


def make_controlnet_train_step(
    *,
    unet,
    vae,
    clip,
    controlnet,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    dtype=jnp.bfloat16,
):
    """svd-temporal-controlnet/train_svd.py step: trains the whole
    ControlNet; UNet/VAE/CLIP frozen.

    batch: 'video' (B,F,H,W,3) [-1,1], 'controlnet_cond' (B,F,H,W,3) [0,1]
    depth/heatmap video, 'motion_values' (B,) motion bucket per sample.

    Distinct reference semantics reproduced:
      - conditional latent = mode() of the slightly-noised FIRST frame,
        repeated across frames (train_svd.py:1132-1150)
      - conditioning dropout (:1164-1184): one uniform random_p per sample;
        CLIP embeds zeroed iff random_p < 2p, conditional latents zeroed
        iff p <= random_p < 3p (correlated bands, not independent draws)
      - added_time_ids carry per-sample motion_values (:1151-1159)
      - 8-channel UNet input (no mask channel) with single CLIP token.
    """
    optimizer = optimizer or make_optimizer(cfg)
    edm = EDMConstants(cfg.sigma_min_value, cfg.sigma_max_value, cfg.image_d,
                       cfg.noise_d_low, cfg.noise_d_high, cfg.sigma_data)

    def loss_fn(cn_params, frozen, batch, rng):
        (r_sigma, r_noise, r_vae, r_aug, r_drop_p) = jax.random.split(rng, 5)
        video = batch["video"]
        b, f = video.shape[0], video.shape[1]

        flat = video.reshape((b * f,) + video.shape[2:]).astype(dtype)
        latents = vae.apply(frozen["vae"], flat, r_vae, method=vae.encode_sample)
        latents = (latents * vae.config.scaling_factor).astype(jnp.float32)
        latents = latents.reshape((b, f) + latents.shape[1:])

        sigmas = rand_cosine_interpolated(r_sigma, (b,), edm)
        s = sigmas.reshape(b, 1, 1, 1, 1)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy = latents + noise * s
        timesteps = sigma_to_timestep(sigmas)
        c_in, _, _ = edm_preconditioning(s)
        inp = (noisy * c_in).astype(dtype)

        # first-frame conditioning (train_svd.py:1132-1150)
        first = video[:, 0].astype(jnp.float32)
        first_aug = first + cfg.cond_noise_aug_strength * jax.random.normal(r_aug, first.shape)
        cond_lat = vae.apply(frozen["vae"], first_aug.astype(dtype), method=vae.encode_mode)

        emb = _encode_clip_embeddings(clip, frozen["clip"], video[:, 0], dtype)

        # conditioning dropout for CFG (train_svd.py:1164-1184): ONE uniform
        # random_p per sample with correlated bands — prompt dropped iff
        # random_p < 2p; image dropped iff p <= random_p < 3p.  So "both
        # dropped" has prob p (the [p, 2p) band) and "image-only" has prob p
        # (the [2p, 3p) band), matching InstructPix2Pix §3.2.1 semantics.
        if cfg.conditioning_dropout_prob > 0:
            prompt_keep, image_keep = conditioning_dropout_masks(
                r_drop_p, b, cfg.conditioning_dropout_prob)
            emb = emb * prompt_keep.astype(dtype)[:, None, None]
            cond_lat = cond_lat * image_keep.astype(dtype)[:, None, None, None]

        cond_lat = jnp.broadcast_to(cond_lat[:, None], (b, f) + cond_lat.shape[1:])

        motion = batch.get("motion_values", jnp.full((b,), cfg.cond_motion_bucket_id, jnp.float32))
        added_time_ids = jnp.stack([
            jnp.full((b,), cfg.cond_fps, jnp.float32),
            motion.astype(jnp.float32),
            jnp.full((b,), cfg.cond_noise_aug_strength, jnp.float32)], axis=1)

        x_in = jnp.concatenate([inp, cond_lat.astype(dtype)], axis=-1)  # 8 ch

        down_res, mid_res = controlnet.apply(
            cn_params, x_in, timesteps, emb, added_time_ids,
            batch["controlnet_cond"].astype(dtype), 1.0)

        model_pred, _ = unet.apply(
            frozen["unet"], x_in, timesteps, emb, added_time_ids,
            down_block_residuals=down_res, mid_block_residual=mid_res)

        loss = edm_mse_loss(model_pred, noisy, latents, sigmas)
        return loss, {"loss": loss}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, frozen, batch, rng):
        (_, metrics), grads = grad_fn(state.trainable, frozen, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        ema = state.ema
        if ema is not None:  # EMA on controlnet (train_svd.py:816-818)
            ema = optax.incremental_update(trainable, ema, 1.0 - cfg.ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, trainable=trainable,
                          opt_state=opt_state, ema=ema), metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        step_jit = jax.jit(train_step, in_shardings=(repl, repl, batch_sh, repl),
                           out_shardings=(repl, repl), donate_argnums=(0,))
    else:
        step_jit = jax.jit(train_step, donate_argnums=(0,))
    return step_jit, optimizer
