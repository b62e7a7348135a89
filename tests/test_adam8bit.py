"""Blockwise 8-bit-state AdamW (tvi/train/adam8bit.py) — the TPU-native
rebuild of the reference's --use_8bit_adam (bitsandbytes AdamW8bit,
src/train.py:392-397)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tvi.train.adam8bit import BLOCK, adamw_8bit, scale_by_adam_8bit


def test_tracks_fp32_adam_on_quadratic():
    """Optimizing a quadratic: the int8-state trajectory stays close to
    fp32 Adam and reaches the same optimum region."""
    target = jnp.asarray(np.random.RandomState(0).randn(300).astype(np.float32))

    def loss(p):
        return jnp.sum((p - target) ** 2)

    lr = 1e-1
    opt8 = adamw_8bit(lr, weight_decay=0.0)
    opt32 = optax.adamw(lr, weight_decay=0.0)
    p8 = p32 = jnp.zeros_like(target)
    s8, s32 = opt8.init(p8), opt32.init(p32)

    @jax.jit
    def step(p8, s8, p32, s32):
        g8 = jax.grad(loss)(p8)
        u8, s8 = opt8.update(g8, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        g32 = jax.grad(loss)(p32)
        u32, s32 = opt32.update(g32, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        return p8, s8, p32, s32

    for _ in range(60):
        p8, s8, p32, s32 = step(p8, s8, p32, s32)
    # both should be well on the way to target; trajectories near-equal
    assert float(loss(p8)) < 0.05 * float(loss(jnp.zeros_like(target)))
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p32),
                               atol=0.05, rtol=0.1)


def test_state_is_int8_and_4x_smaller():
    params = {"w": jnp.zeros((1000, 7)), "b": jnp.zeros((13,))}
    state = scale_by_adam_8bit().init(params)
    for q in jax.tree.leaves(state.mu, is_leaf=lambda x: hasattr(x, "q")):
        pass
    mu_w = state.mu["w"]
    assert mu_w.q.dtype == jnp.int8
    assert mu_w.q.size == -(-7000 // BLOCK) * BLOCK      # padded flat
    assert mu_w.scale.dtype == jnp.float32
    assert mu_w.scale.size == -(-7000 // BLOCK)
    # bytes: int8 moments + fp32 per-block scales << fp32 moments
    m_bytes = mu_w.q.size + 4 * mu_w.scale.size
    assert m_bytes < 0.3 * (7000 * 4)


def test_zero_and_tiny_gradients_stable():
    """All-zero blocks (scale 0) must not produce NaNs/Infs."""
    opt = scale_by_adam_8bit()
    p = jnp.zeros((512,))
    s = opt.init(p)
    g = jnp.zeros((512,)).at[0].set(1e-12)
    u, s = opt.update(g, s, p)
    assert np.isfinite(np.asarray(u)).all()
    u, s = opt.update(jnp.zeros((512,)), s, p)
    assert np.isfinite(np.asarray(u)).all()


def test_trainer_integration_loss_decreases():
    """make_interp_train_step with cfg.use_8bit_adam trains (tiny models,
    a few steps, loss trends down)."""
    from tests.test_train import TINY_TRAIN, _batch, _models, _params
    from tvi.train.params import partition_params, temporal_predicate
    from tvi.train.trainer import create_train_state, make_interp_train_step

    rng = jax.random.PRNGKey(0)
    unet, vae, clip, proj = _models()
    params = _params(rng, unet, vae, clip, proj)
    unet_train, unet_frozen = partition_params(params["unet"],
                                               temporal_predicate)
    cfg = TINY_TRAIN.replace(use_8bit_adam=True, learning_rate=3e-3)
    step, opt = make_interp_train_step(
        unet=unet, vae=vae, clip=clip, projector=proj, cfg=cfg,
        dtype=jnp.float32)
    state = create_train_state(
        {"unet": unet_train, "projector": params["projector"]}, opt)
    frozen = {"unet": unet_frozen, "vae": params["vae"],
              "clip": params["clip"], "mask_token": params["mask_token"]}
    batch = _batch(rng)
    losses = []
    for i in range(6):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert min(losses[3:]) < losses[0], losses


def test_flat_variant_tracks_fp32_adam():
    """The flat (single-buffer) storage layout — the fix for the per-leaf
    variant's thousands-of-tiny-kernels launch tax (PERF.md r5 config-5) —
    optimizes a multi-leaf quadratic like fp32 Adam.  (It is NOT bit-equal
    to the per-leaf variant: block boundaries differ across the
    concatenation, so only optimizer QUALITY is asserted.)"""
    rs = np.random.RandomState(1)
    target = {"a": jnp.asarray(rs.randn(300, 3), jnp.float32),
              "b": jnp.asarray(rs.randn(17), jnp.float32)}

    def loss(p):
        return sum(jnp.sum((p[k] - target[k]) ** 2) for k in p)

    opt8 = adamw_8bit(1e-1, weight_decay=0.0, flat=True)
    opt32 = optax.adamw(1e-1, weight_decay=0.0)
    p8 = p32 = jax.tree.map(jnp.zeros_like, target)
    s8, s32 = opt8.init(p8), opt32.init(p32)
    for _ in range(60):
        g = jax.grad(loss)(p8)
        u, s8 = opt8.update(g, s8, p8)
        p8 = optax.apply_updates(p8, u)
        g = jax.grad(loss)(p32)
        u, s32 = opt32.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u)
    z = jax.tree.map(jnp.zeros_like, target)
    assert float(loss(p8)) < 0.05 * float(loss(z))
    for k in target:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p32[k]),
                                   atol=0.08, rtol=0.1)
