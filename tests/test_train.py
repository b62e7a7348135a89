"""Training-step tests: loss decreases, partitioning freezes correctly,
multi-device DP sharding works on the 8-way virtual CPU mesh, checkpoints
rotate and resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvi.core.config import (
    TINY_CLIP,
    TINY_UNET,
    TINY_VAE,
    ControlNetConfig,
    TrainConfig,
)
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.controlnet import ControlNetSVDModel
from tvi.models.projector import FeatureProjector
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder
from tvi.parallel.mesh import MeshSpec, create_mesh, shard_batch
from tvi.train.params import count_params, merge_params, partition_params, temporal_predicate
from tvi.train.trainer import (
    TrainState,
    create_train_state,
    make_controlnet_train_step,
    make_interp_train_step,
)

B, F, H, W = 2, 4, 16, 16
TINY_TRAIN = TrainConfig(
    per_device_batch_size=1, learning_rate=1e-3, max_grad_norm=1.0,
    cond_fps=6, cond_motion_bucket_id=100)

tiny_clip = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)


def _models(dtype=jnp.float32):
    unet = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(TINY_VAE, dtype=dtype)
    clip = CLIPVisionModelWithProjection(tiny_clip, dtype=dtype)
    proj = FeatureProjector(output_dim=TINY_UNET.cross_attention_dim, dtype=dtype)
    return unet, vae, clip, proj


def _params(rng, unet, vae, clip, proj):
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    return dict(
        unet=unet.init_params(r1),
        vae=vae.init(r2, jnp.zeros((1, 16, 16, 3)), 1),
        clip=clip.init(r3, jnp.zeros((1, 32, 32, 3))),
        projector=proj.init(r4, jnp.zeros((1, 1, 2 * TINY_UNET.cross_attention_dim))),
        mask_token=jax.random.normal(r5, (4,)),
    )


def _batch(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "video": jax.random.uniform(k1, (B, F, H, W, 3)) * 2 - 1,
        "first": jax.random.uniform(k2, (B, H, W, 3)) * 2 - 1,
        "end": jax.random.uniform(k3, (B, H, W, 3)) * 2 - 1,
    }


class TestPartitioning:
    def test_temporal_subset_is_proper(self, rng):
        unet, vae, clip, proj = _models()
        params = _params(rng, unet, vae, clip, proj)
        train, frozen = partition_params(params["unet"], temporal_predicate)
        n_train, n_frozen = count_params(train), count_params(frozen)
        assert n_train > 0 and n_frozen > 0
        assert count_params(params["unet"]) == n_train + n_frozen
        merged = merge_params(train, frozen)
        chex_equal = jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), merged, params["unet"]))
        assert chex_equal


class TestInterpTrainStep:
    @pytest.fixture(scope="class")
    def setup(self, rng):
        unet, vae, clip, proj = _models()
        params = _params(rng, unet, vae, clip, proj)
        unet_train, unet_frozen = partition_params(params["unet"], temporal_predicate)
        trainable = {"unet": unet_train, "projector": params["projector"]}
        frozen = {"unet": unet_frozen, "vae": params["vae"],
                  "clip": params["clip"], "mask_token": params["mask_token"]}
        step, opt = make_interp_train_step(
            unet=unet, vae=vae, clip=clip, projector=proj,
            cfg=TINY_TRAIN, dtype=jnp.float32)
        # the step donates its state argument, so hand out fresh states
        make_state = lambda: create_train_state(
            jax.tree.map(jnp.copy, trainable), opt)
        return step, make_state, frozen

    def test_loss_decreases_on_fixed_batch(self, setup, rng):
        step, make_state, frozen = setup
        state = make_state()
        batch = _batch(rng)
        losses = []
        r = jax.random.PRNGKey(3)
        for i in range(8):
            state, metrics = step(state, frozen, batch, jax.random.PRNGKey(3))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_frozen_params_untouched(self, setup, rng):
        step, make_state, frozen = setup
        state = make_state()
        before = jax.tree.map(jnp.copy, frozen)
        state, _ = step(state, frozen, _batch(rng), jax.random.PRNGKey(0))
        same = jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), before, frozen))
        assert same

    def test_monotonicity_loss_path(self, rng):
        unet, vae, clip, proj = _models()
        params = _params(rng, unet, vae, clip, proj)
        unet_train, unet_frozen = partition_params(params["unet"], temporal_predicate)
        cfg = TINY_TRAIN.replace(use_monotonicity_loss=True,
                                 use_attention_mask=True,
                                 mask_token_conditioning=False)
        step, opt = make_interp_train_step(
            unet=unet, vae=vae, clip=clip, projector=proj, cfg=cfg,
            dtype=jnp.float32)
        state = create_train_state(
            {"unet": unet_train, "projector": params["projector"]}, opt)
        frozen = {"unet": unet_frozen, "vae": params["vae"],
                  "clip": params["clip"], "mask_token": params["mask_token"]}
        _, metrics = step(state, frozen, _batch(rng), jax.random.PRNGKey(0))
        assert "monotonicity_loss" in metrics
        assert np.isfinite(float(metrics["monotonicity_loss"]))


class TestDataParallelMesh:
    def test_step_on_8_device_mesh(self, rng):
        assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
        mesh = create_mesh(MeshSpec(data=8))
        unet, vae, clip, proj = _models()
        params = _params(rng, unet, vae, clip, proj)
        unet_train, unet_frozen = partition_params(params["unet"], temporal_predicate)
        step, opt = make_interp_train_step(
            unet=unet, vae=vae, clip=clip, projector=proj,
            cfg=TINY_TRAIN, mesh=mesh, dtype=jnp.float32)
        state = create_train_state({"unet": unet_train,
                                    "projector": params["projector"]}, opt)
        frozen = {"unet": unet_frozen, "vae": params["vae"],
                  "clip": params["clip"], "mask_token": params["mask_token"]}
        k1, k2, k3 = jax.random.split(rng, 3)
        batch = {
            "video": jax.random.uniform(k1, (8, F, H, W, 3)) * 2 - 1,
            "first": jax.random.uniform(k2, (8, H, W, 3)) * 2 - 1,
            "end": jax.random.uniform(k3, (8, H, W, 3)) * 2 - 1,
        }
        batch = shard_batch(mesh, batch)
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated
        leaf = jax.tree.leaves(state.trainable)[0]
        assert leaf.sharding.is_fully_replicated


class TestControlNetTrainStep:
    def test_whole_controlnet_trains(self, rng):
        unet8 = UNetSpatioTemporalConditionModel(
            TINY_UNET.replace(in_channels=8), dtype=jnp.float32)
        vae = AutoencoderKLTemporalDecoder(TINY_VAE, dtype=jnp.float32)
        clip = CLIPVisionModelWithProjection(tiny_clip, dtype=jnp.float32)
        cn_cfg = ControlNetConfig.from_unet(TINY_UNET.replace(in_channels=8))
        cn = ControlNetSVDModel(cn_cfg, dtype=jnp.float32)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        unet_params = unet8.init_params(r1)
        vae_params = vae.init(r2, jnp.zeros((1, 16, 16, 3)), 1)
        clip_params = clip.init(r3, jnp.zeros((1, 32, 32, 3)))
        ctx0 = jnp.zeros((1, 1, TINY_UNET.cross_attention_dim))
        # conditioning video lives at 8x the latent resolution (the
        # conditioning embedding downsamples 8x, controlnet_svd.py:81-91);
        # tiny VAE downscale is 2, so latent h = H//2 and cond res = 4*H
        lat_h, lat_w = H // 2, W // 2
        cn_params = cn.init(r4, jnp.zeros((1, F, lat_h, lat_w, 8)), jnp.zeros(()),
                            ctx0, jnp.zeros((1, 3)),
                            jnp.zeros((1, F, lat_h * 8, lat_w * 8, 3)))
        cfg = TINY_TRAIN.replace(conditioning_dropout_prob=0.1, use_ema=True)
        step, opt = make_controlnet_train_step(
            unet=unet8, vae=vae, clip=clip, controlnet=cn, cfg=cfg,
            dtype=jnp.float32)
        state = create_train_state(cn_params, opt, use_ema=True)
        frozen = {"unet": unet_params, "vae": vae_params, "clip": clip_params}
        batch = {
            "video": jax.random.uniform(rng, (B, F, H, W, 3)) * 2 - 1,
            "controlnet_cond": jax.random.uniform(rng, (B, F, (H // 2) * 8, (W // 2) * 8, 3)),
            "motion_values": jnp.asarray([10.0, 20.0]),
        }
        before = jax.tree.leaves(state.trainable)[0].copy()
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert state.ema is not None


class TestValidationLengths:
    def test_validation_renders_both_lengths(self, tmp_path):
        """Validation renders one GIF PER length (reference
        model_lengths=[14, 40], src/train.py:741); tiny CLI run with
        --validation_lengths 3,5 must write both step GIFs."""
        import os

        from tvi.train.train_interp import main

        out = tmp_path / "out"
        main(["--tiny", "--synthetic_data", "--output_dir", str(out),
              "--width", "32", "--height", "32", "--sample_n_frames", "4",
              "--per_gpu_batch_size", "1", "--max_train_steps", "1",
              "--validation_steps", "1", "--validation_lengths", "3,5",
              "--checkpointing_steps", "100", "--topology", "acc_0"])
        vdir = out / "validation"
        gifs = sorted(os.listdir(vdir))
        assert gifs == ["step_000001_f3.gif", "step_000001_f5.gif"]


class TestCheckpointing:
    def test_save_rotate_resume(self, rng, tmp_path_factory):
        from tvi.io.orbax_ckpt import CheckpointManager
        d = str(tmp_path_factory.mktemp("ckpt"))
        mgr = CheckpointManager(d, total_limit=2)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        for step in [1, 2, 3]:
            mgr.save(step, jax.tree.map(lambda x: x * step, tree))
        mgr.wait()
        assert mgr.all_steps() == [2, 3]  # rotation keeps last 2
        step, restored = mgr.restore_latest(jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree))
        assert step == 3
        np.testing.assert_allclose(restored["a"], np.arange(4.0) * 3)
        mgr.close()


class TestConditioningDropout:
    """The CFG dropout must follow train_svd.py:1164-1184's correlated-band
    scheme: one random_p per sample; prompt dropped iff r < 2p, image
    dropped iff p <= r < 3p.  Checks the exact joint distribution."""

    def test_band_joint_distribution(self):
        from tvi.train.trainer import conditioning_dropout_masks
        p = 0.1
        n = 200_000
        pk, ik = conditioning_dropout_masks(jax.random.PRNGKey(0), n, p)
        pk, ik = np.asarray(pk), np.asarray(ik)
        # marginals: prompt dropped w.p. 2p; image dropped w.p. 2p
        assert abs((1 - pk).mean() - 2 * p) < 0.005
        assert abs((1 - ik).mean() - 2 * p) < 0.005
        # joint bands: both dropped == r in [p, 2p) -> prob p;
        # prompt-only == r < p -> prob p; image-only == r in [2p, 3p) -> p
        both = ((pk == 0) & (ik == 0)).mean()
        prompt_only = ((pk == 0) & (ik == 1)).mean()
        image_only = ((pk == 1) & (ik == 0)).mean()
        assert abs(both - p) < 0.005
        assert abs(prompt_only - p) < 0.005
        assert abs(image_only - p) < 0.005

    def test_matches_reference_formula_exactly(self):
        from tvi.train.trainer import conditioning_dropout_masks
        p = 0.07
        rng = jax.random.PRNGKey(3)
        pk, ik = conditioning_dropout_masks(rng, 4096, p)
        r = jax.random.uniform(rng, (4096,))
        ref_prompt_keep = ~(r < 2 * p)
        ref_image_keep = 1 - ((r >= p) & (r < 3 * p)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(pk, bool), np.asarray(ref_prompt_keep))
        np.testing.assert_array_equal(np.asarray(ik), np.asarray(ref_image_keep))


class TestGradientCheckpointing:
    """nn.remat over the UNet blocks (reference unet_3d_blocks.py:2032-2054,
    train.py:377-379): gradients must be identical with and without."""

    def test_grads_match_no_remat(self, rng):
        unet = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32)
        unet_r = UNetSpatioTemporalConditionModel(
            TINY_UNET, dtype=jnp.float32, gradient_checkpointing=True)
        params = unet.init_params(rng)
        b, f, h, w = 1, 2, 8, 8
        sample = jax.random.normal(rng, (b, f, h, w, TINY_UNET.in_channels))
        ctx = (jnp.ones((b, 2, TINY_UNET.cross_attention_dim)),
               jnp.ones((b, 1, TINY_UNET.cross_attention_dim)))
        ids = jnp.zeros((b, 3))

        def loss(m, p):
            out, _ = m.apply(p, sample, jnp.zeros((b,)), ctx, ids)
            return jnp.sum(out ** 2)

        g0 = jax.grad(lambda p: loss(unet, p))(params)
        g1 = jax.grad(lambda p: loss(unet_r, p))(params)
        for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("mode", ["convs", "convs2", "dots"])
    def test_remat_policy_grads_match(self, rng, monkeypatch, mode):
        """TVI_REMAT_POLICY (unet_st._remat_policy) changes memory/time only:
        grads under every selective-save policy equal the full-remat grads."""
        unet_r = UNetSpatioTemporalConditionModel(
            TINY_UNET, dtype=jnp.float32, gradient_checkpointing=True)
        params = unet_r.init_params(rng)
        b, f, h, w = 1, 2, 8, 8
        sample = jax.random.normal(rng, (b, f, h, w, TINY_UNET.in_channels))
        ctx = (jnp.ones((b, 2, TINY_UNET.cross_attention_dim)),
               jnp.ones((b, 1, TINY_UNET.cross_attention_dim)))
        ids = jnp.zeros((b, 3))

        def grads(policy):
            # fresh trace per policy: the knob is read at trace time
            monkeypatch.setenv("TVI_REMAT_POLICY", policy)

            def loss(p):
                out, _ = unet_r.apply(p, sample, jnp.zeros((b,)), ctx, ids)
                return jnp.sum(out ** 2)

            return jax.grad(loss)(params)

        g_full = grads("full")
        g_mode = grads(mode)
        for a, b_ in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_mode)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5, rtol=1e-5)

    def test_remat_policy_rejects_unknown(self, monkeypatch):
        from tvi.models.unet_st import _remat_policy
        monkeypatch.setenv("TVI_REMAT_POLICY", "bogus")
        with pytest.raises(ValueError):
            _remat_policy()


class TestAllTrainersOnMesh:
    """VERDICT r4 item 6: the ControlNet and decoupled trainers get the same
    8-device DP mesh + 1-device value-equivalence treatment as the interp
    trainer (mirrors the gates in __graft_entry__.dryrun_multichip).

    Tolerances follow the dryrun: loss matches to fp32 reduction noise;
    params may differ by ~lr on elements whose gradient is pure
    reduction-order noise (Adam normalizes that noise to an lr-sized step).
    """

    def _equiv_gate(self, state_n, state_1, loss_n, loss_1, lr):
        np.testing.assert_allclose(loss_n, loss_1, rtol=1e-5, atol=1e-6)
        for a_n, a_1 in zip(jax.tree.leaves(state_n.trainable),
                            jax.tree.leaves(state_1.trainable)):
            np.testing.assert_allclose(np.asarray(a_n), np.asarray(a_1),
                                       rtol=1e-3, atol=2 * lr)

    def test_controlnet_step_on_8_device_mesh(self, rng):
        assert len(jax.devices()) == 8
        mesh = create_mesh(MeshSpec(data=8))
        unet8 = UNetSpatioTemporalConditionModel(
            TINY_UNET.replace(in_channels=8), dtype=jnp.float32)
        vae = AutoencoderKLTemporalDecoder(TINY_VAE, dtype=jnp.float32)
        clip = CLIPVisionModelWithProjection(tiny_clip, dtype=jnp.float32)
        cn_cfg = ControlNetConfig.from_unet(TINY_UNET.replace(in_channels=8))
        cn = ControlNetSVDModel(cn_cfg, dtype=jnp.float32)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        lat_h, lat_w = H // 2, W // 2
        ctx0 = jnp.zeros((1, 1, TINY_UNET.cross_attention_dim))
        frozen = {
            "unet": unet8.init_params(r1),
            "vae": vae.init(r2, jnp.zeros((1, 16, 16, 3)), 1),
            "clip": clip.init(r3, jnp.zeros((1, 32, 32, 3))),
        }
        cn_params = cn.init(r4, jnp.zeros((1, F, lat_h, lat_w, 8)),
                            jnp.zeros(()), ctx0, jnp.zeros((1, 3)),
                            jnp.zeros((1, F, lat_h * 8, lat_w * 8, 3)))
        cfg = TINY_TRAIN  # no dropout: dropout rng would differ per layout
        k1, k2 = jax.random.split(rng, 2)
        batch = {
            "video": jax.random.uniform(k1, (8, F, H, W, 3)) * 2 - 1,
            "controlnet_cond": jax.random.uniform(
                k2, (8, F, lat_h * 8, lat_w * 8, 3)),
            "motion_values": jnp.arange(8.0) + 5.0,
        }
        cn_copy = jax.tree.map(np.array, cn_params)

        step_n, opt = make_controlnet_train_step(
            unet=unet8, vae=vae, clip=clip, controlnet=cn, cfg=cfg,
            mesh=mesh, dtype=jnp.float32)
        state_n = create_train_state(cn_params, opt)
        state_n, metrics_n = step_n(state_n, frozen,
                                    shard_batch(mesh, batch),
                                    jax.random.PRNGKey(1))
        loss_n = float(metrics_n["loss"])
        assert np.isfinite(loss_n)
        assert jax.tree.leaves(state_n.trainable)[0].sharding.is_fully_replicated

        step_1, _ = make_controlnet_train_step(
            unet=unet8, vae=vae, clip=clip, controlnet=cn, cfg=cfg,
            optimizer=opt, dtype=jnp.float32)
        state_1 = create_train_state(cn_copy, opt)
        state_1, metrics_1 = step_1(state_1, frozen, batch,
                                    jax.random.PRNGKey(1))
        self._equiv_gate(state_n, state_1, loss_n,
                         float(metrics_1["loss"]), cfg.learning_rate)

    def test_decoupled_step_on_8_device_mesh(self, rng):
        from tvi.models.projector import MotionEncoder

        assert len(jax.devices()) == 8
        mesh = create_mesh(MeshSpec(data=8))
        unet, vae, clip, proj = _models()
        enc = MotionEncoder(output_dim=TINY_UNET.cross_attention_dim,
                            dtype=jnp.float32)
        params = _params(rng, unet, vae, clip, proj)
        enc_params = enc.init(jax.random.PRNGKey(9),
                              jnp.zeros((1, 16, 16, 1)))
        unet_train, unet_frozen = partition_params(params["unet"],
                                                   temporal_predicate)
        cfg = TINY_TRAIN.replace(use_monotonicity_loss=True,
                                 use_attention_mask=True,
                                 mask_token_conditioning=False)
        trainable = {"unet": unet_train, "projector": params["projector"],
                     "motion_encoder": enc_params}
        trainable_copy = jax.tree.map(np.array, trainable)
        frozen = {"unet": unet_frozen, "vae": params["vae"],
                  "clip": params["clip"], "mask_token": params["mask_token"]}
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        batch = {
            "video": jax.random.uniform(k1, (8, F, H, W, 3)) * 2 - 1,
            "first": jax.random.uniform(k2, (8, H, W, 3)) * 2 - 1,
            "end": jax.random.uniform(k3, (8, H, W, 3)) * 2 - 1,
            "motion_first": jax.random.uniform(k4, (8, 16, 16, 1)),
            "motion_end": jax.random.uniform(k5, (8, 16, 16, 1)),
        }

        step_n, opt = make_interp_train_step(
            unet=unet, vae=vae, clip=clip, projector=proj,
            motion_encoder=enc, cfg=cfg, mesh=mesh, dtype=jnp.float32)
        state_n = create_train_state(trainable, opt)
        state_n, metrics_n = step_n(state_n, frozen,
                                    shard_batch(mesh, batch),
                                    jax.random.PRNGKey(1))
        loss_n = float(metrics_n["loss"])
        assert np.isfinite(loss_n)
        assert np.isfinite(float(metrics_n["monotonicity_loss"]))

        step_1, _ = make_interp_train_step(
            unet=unet, vae=vae, clip=clip, projector=proj,
            motion_encoder=enc, cfg=cfg, optimizer=opt, dtype=jnp.float32)
        state_1 = create_train_state(trainable_copy, opt)
        state_1, metrics_1 = step_1(state_1, frozen, batch,
                                    jax.random.PRNGKey(1))
        self._equiv_gate(state_n, state_1, loss_n,
                         float(metrics_1["loss"]), cfg.learning_rate)
