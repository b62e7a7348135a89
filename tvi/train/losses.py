"""Training losses: EDM-weighted latent MSE + the attention-monotonicity
regularizer.

EDM loss (src/train.py:592-607): denoised = pred*c_out + c_skip*noisy;
weight = (1+sigma^2)/sigma^2; per-sample mean over (F,h,w,C), then batch
mean.

Monotonicity loss (train_decouples.py:1012-1062): across frames, the
temporal cross-attention similarity to the FIRST image token should
steadily decrease and to the END token steadily increase; penalize mean
change below a 0.05 margin (ReLU hinge) plus the std of the changes.
In the reference the per-frame similarities come from the monkey-patched
attention; here they are the functional AttnStats aux outputs
(tvi.ops.attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tvi.diffusion.edm import edm_loss_weight, edm_preconditioning


def edm_mse_loss(model_pred: jax.Array, noisy_latents: jax.Array,
                 target_latents: jax.Array, sigmas: jax.Array) -> jax.Array:
    """All args (B, F, h, w, C) except sigmas (B,)."""
    s = sigmas.reshape((-1,) + (1,) * (model_pred.ndim - 1))
    _, c_skip, c_out = edm_preconditioning(s)
    denoised = model_pred.astype(jnp.float32) * c_out + c_skip * noisy_latents.astype(jnp.float32)
    w = edm_loss_weight(s)
    sq = (denoised - target_latents.astype(jnp.float32)) ** 2
    per_sample = (w * sq).reshape(sq.shape[0], -1).mean(axis=1)
    return per_sample.mean()


def attention_monotonicity_loss(stats_tree, margin: float = 0.05) -> jax.Array:
    """stats_tree: the sowed 'intermediates' collection holding AttnStats
    tuples of (first (F,), end (F,)) per temporal cross-attention layer.
    Returns the reference's hinge+std penalty (train_decouples.py:1030-1060):
    summed across layers per frame, then
      relu(margin - mean(start[i]-start[i+1])) + std(diffs)   (decreasing)
    + relu(margin - mean(end[i+1]-end[i]))   + std(diffs)     (increasing).
    """
    leaves = jax.tree.leaves(stats_tree)
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    n = len(leaves) // 2
    # AttnStats namedtuples flatten to [first0, end0, first1, end1, ...]
    firsts = jnp.stack(leaves[0::2]).astype(jnp.float32).sum(axis=0)  # (F,)
    ends = jnp.stack(leaves[1::2]).astype(jnp.float32).sum(axis=0)    # (F,)
    start_diffs = firsts[:-1] - firsts[1:]
    end_diffs = ends[1:] - ends[:-1]
    loss = (jax.nn.relu(margin - start_diffs.mean()) + start_diffs.std()
            + jax.nn.relu(margin - end_diffs.mean()) + end_diffs.std())
    return loss


def frame_matching_loss(model_pred: jax.Array, noisy_latents: jax.Array,
                        target_latents: jax.Array, sigmas: jax.Array) -> jax.Array:
    """Optional per-frame MSE between denoised and target frames
    (train_decouples.py:997-1010): unweighted per-frame means."""
    s = sigmas.reshape((-1,) + (1,) * (model_pred.ndim - 1))
    _, c_skip, c_out = edm_preconditioning(s)
    denoised = model_pred.astype(jnp.float32) * c_out + c_skip * noisy_latents.astype(jnp.float32)
    sq = (denoised - target_latents.astype(jnp.float32)) ** 2
    return sq.mean(axis=(2, 3, 4)).mean()
