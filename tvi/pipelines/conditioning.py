"""Conditioning assembly shared by the pipelines and trainers.

This is the fork's core mechanism (SURVEY §7.3.1 — 'bit-faithful
conditioning plumbing'): the per-frame conditioning latents are
[first_latent, mask_token x (F-2), end_latent] plus a binary mask channel
that is 0 on the first and last frames (src/train.py:546-557, pipeline
:506-520).  The ablation flags reproduce the surface of the missing
``StableVideoDiffusionInterpControlPipeline`` reconstructed from its call
site (src/test.py:592-617); their semantics are a documented reconstruction
(marked below) since the pipeline file is absent from the snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CondAblations:
    """Ablation switches, 1:1 with the src/test.py flag block (:628-666)."""

    without_front_embedding: bool = False
    without_end_embedding: bool = False
    without_front_channel: bool = False
    without_end_channel: bool = False
    second_channel_firstframe_condition: bool = False  # sic 'seoncd' in ref
    last_channel_lastframe_condition: bool = False
    channelwise_all_front: bool = False
    channelwise_all_end: bool = False


def assemble_conditioning_latents(
    first_latents: jax.Array,   # (B, h, w, 4)
    end_latents: jax.Array,     # (B, h, w, 4)
    mask_token: jax.Array,      # (4,)
    num_frames: int,
    ablations: CondAblations = CondAblations(),
) -> jax.Array:
    """Returns (B, F, h, w, 5): 4 conditioning channels + mask channel."""
    b, h, w, c = first_latents.shape
    first = first_latents[:, None]                       # (B, 1, h, w, 4)
    end = end_latents[:, None]
    middle = jnp.broadcast_to(mask_token.astype(first.dtype),
                              (b, num_frames - 2, h, w, c))

    # RECONSTRUCTED ablations (missing-pipeline semantics from call sites):
    if ablations.channelwise_all_front:
        middle = jnp.broadcast_to(first, middle.shape)
    elif ablations.channelwise_all_end:
        middle = jnp.broadcast_to(end, middle.shape)
    else:
        if ablations.second_channel_firstframe_condition:
            middle = jnp.concatenate([jnp.broadcast_to(first, (b, 1, h, w, c)),
                                      middle[:, 1:]], axis=1)
        if ablations.last_channel_lastframe_condition:
            middle = jnp.concatenate([middle[:, :-1],
                                      jnp.broadcast_to(end, (b, 1, h, w, c))], axis=1)

    if ablations.without_front_channel:
        first = jnp.zeros_like(first)
    if ablations.without_end_channel:
        end = jnp.zeros_like(end)

    cond = jnp.concatenate([first, middle, end], axis=1)  # (B, F, h, w, 4)

    # binary mask channel: 1 everywhere except the conditioned endpoint
    # frames (train.py:551-555)
    mask = jnp.ones((b, num_frames, h, w, 1), dtype=cond.dtype)
    mask = mask.at[:, 0].set(0.0)
    mask = mask.at[:, -1].set(0.0)
    return jnp.concatenate([cond, mask], axis=-1)


def assemble_first_frame_conditioning(
    first_latents: jax.Array,   # (B, h, w, 4)
    num_frames: int,
) -> jax.Array:
    """The sub-project's SVD img2vid conditioning: the (noise-augmented)
    first-frame latent repeated across all F frames, 8 channels total after
    the channel-concat with the noisy latents — NO mask channel and no end
    frame (svd-temporal-controlnet/train_svd.py:1132-1135,1187-1190; called
    from run_inference.py:277-287).  Returns (B, F, h, w, 4)."""
    b, h, w, c = first_latents.shape
    return jnp.broadcast_to(first_latents[:, None], (b, num_frames, h, w, c))


def assemble_context(
    first_emb: jax.Array,   # (B, 1, 1024) CLIP image embeds
    end_emb: jax.Array,     # (B, 1, 1024)
    projector_fn=None,      # (B, 1, 2048) -> (B, 1, 1024)
    do_motion_prompt: bool = True,
    ablations: CondAblations = CondAblations(),
):
    """CLIP-embedding context assembly.

    With ``do_motion_prompt`` (the train.py:561-566 path): returns a tuple
    (spatial (B,2,1024) = [first, end] tokens, temporal (B,1,1024) =
    projector(concat_channels)).  Without it, the plain single-token SVD
    context (pipeline default, :436-449).
    """
    if ablations.without_front_embedding:
        first_emb = jnp.zeros_like(first_emb)
    if ablations.without_end_embedding:
        end_emb = jnp.zeros_like(end_emb)

    if do_motion_prompt and projector_fn is not None:
        spatial = jnp.concatenate([first_emb, end_emb], axis=1)
        temporal = projector_fn(jnp.concatenate([first_emb, end_emb], axis=-1))
        return spatial, temporal
    if projector_fn is not None:
        # reference pipeline:446-449 quirk: projects the END embedding twice
        proj_end = projector_fn(end_emb)
        return jnp.concatenate([proj_end, proj_end], axis=1)
    return first_emb
