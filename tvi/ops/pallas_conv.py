"""Pallas TPU 3x3 convolution (stride 1, SAME) as nine chained MXU matmuls.

Why: direct roofline probes (scripts/perf_lab.py conv_*, mm_bf16_16k) show
XLA's conv lowering reaching only 43-78 TFLOP/s at every conv shape in this
model, on a chip that sustains ~1300 TFLOP/s on large matmuls — and convs
are ~60% of the pipeline's FLOPs (UNet resnets ~56T/step, VAE decode
~166T).  A 3x3 SAME conv is exactly nine shifted (rows, C) x (C, Co)
matmuls accumulated in fp32 — MXU-native work if the shifted windows come
from VMEM instead of nine HBM passes.

Kernel design:
  - input pre-padded by 1 in H and W (plus H rounded up to the row-block);
    grid (N, Hpad/BH).
  - overlapping halo reads via the two-adjacent-blocks trick: the same
    padded array is passed twice with block index maps h and h+1, giving
    the kernel rows [h*BH, h*BH + 2*BH) of which it needs BH+2 — plain
    BlockSpecs cannot express overlapping windows, two offset views can.
  - the three column shifts (dc = 0,1,2) are materialized ONCE per program
    as sublane-sliced copies; the three row shifts are free major-dim
    slices of those.  Nine dot_generals accumulate into an fp32 (BH*W, Co)
    register tile; bias (+ optional fused SiLU) in the epilogue.

Replaces (behind TVI_PALLAS_CONV=1, via tvi.models.layers.PallasConv3x3)
the reference's torch Conv2d(3,3,pad=1) sites: diffusers ResnetBlock2D
conv1/conv2 and the VAE decoder convs (reference src/models/ stacks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TARGET_ROWS = 8192  # target BH*W rows per program's matmul


def _conv_kernel(xa_ref, xb_ref, w_ref, b_ref, o_ref, *, bh: int, w: int,
                 apply_silu: bool):
    # xa/xb: consecutive (1, BH, W+2, C) blocks of the padded input;
    # rows [0, BH+2) of their concatenation cover the halo window.
    xa = xa_ref[0]
    xb = xb_ref[0]
    window = jnp.concatenate([xa, xb[:2]], axis=0)     # (BH+2, W+2, C)
    c = window.shape[-1]
    co = w_ref.shape[-1]
    # Three column shifts materialized once (sublane-offset slices -> one
    # relayout copy each), immediately collapsed to ((BH+2)*W, C).  Row
    # taps are then rows [dr*W, dr*W + BH*W) of the collapsed view — the
    # offset is a multiple of W (itself a multiple of the 8-sublane tile),
    # so all nine tap windows are ALIGNED free slices, not copies.
    cols = [window[:, dc:dc + w].reshape((window.shape[0]) * w, c)
            for dc in range(3)]

    acc = None
    for dr in range(3):
        for dc in range(3):
            a = cols[dc][dr * w:dr * w + bh * w]   # aligned static window
            part = jax.lax.dot_general(
                a, w_ref[dr * 3 + dc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = part if acc is None else acc + part
    acc = acc + b_ref[0].astype(jnp.float32)
    if apply_silu:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.reshape(bh, w, co).astype(o_ref.dtype)


def _pick_block_rows(h: int, w: int) -> int:
    """Row-block: ~_TARGET_ROWS matmul rows, multiple of 8, dividing the
    padded H (we control the padding, so just round h up later)."""
    bh = max(8, min(h, _TARGET_ROWS // max(w, 1)))
    return max(8, (bh // 8) * 8)


def conv3x3_eligible(shape, c_out: int) -> bool:
    n, h, w, c = shape
    if w % 16 or w < 256 or h < 8:
        # W % 16: the (BH, W, C) -> (BH*W, C) collapse needs sublane
        # alignment.  W >= 256: measured wins over XLA's conv only at the
        # large-spatial decode shapes (up3 63.0 vs 43.6 TF/s, up2 81.8 vs
        # 64.6); at (.., 128, 512/320) shapes the kernel LOSES (38 vs 45,
        # 43 vs 78) — Mosaic copy overhead dominates small-W blocks.
        return False
    # resident weights + fp32 accumulator + blocks within VMEM budget
    bh = _pick_block_rows(h, w)
    vmem = (9 * c * c_out * 2            # weights
            + 2 * bh * (w + 2) * c * 2   # two input blocks
            + 3 * (bh + 2) * w * c * 2   # column-shift copies
            + bh * w * c_out * 4         # accumulator
            + bh * w * c_out * 2)        # output block
    return vmem < 96 * 1024 * 1024


def _conv_kernel_v3(*refs, bh: int, w: int, h: int, taps: str,
                    prologue: bool, prologue_silu: bool, apply_silu: bool):
    """Single-contraction conv kernel (v3).

    v1's hidden cost is accumulation OUTSIDE the MXU: eight VPU adds on an
    fp32 (BH*W, Co) tile (~32 MB of VPU traffic per 2.4 GFLOP program) plus
    nine MXU weight loads.  v3 lane-concatenates the tap views into one
    (BH*W, K) operand and lets the MXU accumulate internally across K
    tiles: taps="k9" does one K=9C dot, "k3" does three K=3C dots (fewer
    concat copies, two VPU adds).

    Optional GN-apply(+SiLU) prologue: y = act(x * sc + bi) with per-sample
    per-channel (1, 1, C) scale/bias refs (stats computed outside in one
    XLA pass) applied to the halo window in VMEM — the GN->SiLU->conv
    resnet/decoder chain then never round-trips the activation through HBM
    between norm and conv.  SAME-padding zeros are re-zeroed after the
    affine via an iota mask.
    """
    if prologue:
        xa_ref, xb_ref, sc_ref, bi_ref, w_ref, b_ref, o_ref = refs
    else:
        xa_ref, xb_ref, w_ref, b_ref, o_ref = refs
    hh = pl.program_id(1)
    window = jnp.concatenate([xa_ref[0], xb_ref[0][:2]], axis=0)
    c = window.shape[-1]
    co = w_ref.shape[-1]
    if prologue:
        xf = window.astype(jnp.float32)
        y = xf * sc_ref[0] + bi_ref[0]
        if prologue_silu:
            y = y * jax.nn.sigmoid(y)
        # re-zero the SAME padding (affine maps 0 -> bi != 0): row r of the
        # padded array is valid iff 1 <= hh*bh + r <= h; col w' iff
        # 1 <= w' <= w.  Masks built as 3D iotas — Mosaic rejects reshaping
        # a 2D i1 vector to 3D for the [..., None] broadcast.
        rows = jax.lax.broadcasted_iota(jnp.int32, window.shape, 0) + hh * bh
        cols = jax.lax.broadcasted_iota(jnp.int32, window.shape, 1)
        valid = ((rows >= 1) & (rows <= h) & (cols >= 1) & (cols <= w))
        window = jnp.where(valid, y, 0.0).astype(window.dtype)
    # three column shifts, collapsed FIRST (the reshape normalizes each
    # slice's sublane offset — Mosaic cannot lane-concat slices whose
    # layouts carry different sublane offsets), then lane-concatenated
    cols = [window[:, dc:dc + w].reshape(window.shape[0] * w, c)
            for dc in range(3)]
    cols3 = jnp.concatenate(cols, axis=-1)        # ((BH+2)*W, 3C)
    r = bh * w
    if taps == "k9":
        t = jnp.concatenate([cols3[0:r], cols3[w:w + r],
                             cols3[2 * w:2 * w + r]], axis=-1)   # (R, 9C)
        acc = jax.lax.dot_general(
            t, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    else:  # k3
        acc = None
        for dr in range(3):
            part = jax.lax.dot_general(
                cols3[dr * w:dr * w + r], w_ref[dr],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = part if acc is None else acc + part
    acc = acc + b_ref[0].astype(jnp.float32)
    if apply_silu:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.reshape(bh, w, co).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("apply_silu", "prologue_silu",
                                             "taps", "block_rows",
                                             "interpret"))
def conv3x3_pallas_v3(x: jax.Array, w: jax.Array, b: jax.Array,
                      gn_scale: jax.Array | None = None,
                      gn_bias: jax.Array | None = None,
                      apply_silu: bool = False, prologue_silu: bool = True,
                      taps: str = "k9", block_rows: int = 0,
                      interpret: bool = False) -> jax.Array:
    """v3 conv (see _conv_kernel_v3).  x: (N, H, W, C); w: (3, 3, C, Co);
    b: (Co,).  gn_scale/gn_bias: optional per-sample (N, C) fp32 apply-pass
    coefficients (from tvi.ops.groupnorm.group_norm_stats folding) — when
    given, computes conv3x3(act(x * sc + bi)) in one kernel."""
    n, h, wdt, c = x.shape
    co = w.shape[-1]
    prologue = gn_scale is not None
    bh = block_rows or _pick_block_rows(h, wdt)
    hpad = ((h + bh - 1) // bh) * bh
    xp = jnp.pad(x, ((0, 0), (1, hpad - h + 1 + bh), (1, 1), (0, 0)))
    if taps == "k9":
        wz = w.reshape(1, 9 * c, co)
        w_spec = pl.BlockSpec((1, 9 * c, co), lambda nn_, hh: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        wz = w.reshape(3, 3 * c, co)
        w_spec = pl.BlockSpec((3, 3 * c, co), lambda nn_, hh: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    bz = b.reshape(1, co)
    grid = (n, hpad // bh)

    in_block = pl.BlockSpec((1, bh, wdt + 2, c),
                            lambda nn_, hh: (nn_, hh, 0, 0),
                            memory_space=pltpu.VMEM)
    in_block_next = pl.BlockSpec((1, bh, wdt + 2, c),
                                 lambda nn_, hh: (nn_, hh + 1, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [in_block, in_block_next]
    args = [xp, xp]
    if prologue:
        # per-sample (N, 1, C) scale/bias, block (1, 1, C) (Mosaic rule:
        # last two dims of the block must equal the array dims here)
        sc = gn_scale.reshape(n, 1, c).astype(jnp.float32)
        bi = gn_bias.reshape(n, 1, c).astype(jnp.float32)
        stat_spec = pl.BlockSpec((1, 1, c), lambda nn_, hh: (nn_, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [stat_spec, stat_spec]
        args += [sc, bi]
    in_specs += [w_spec,
                 pl.BlockSpec((1, co), lambda nn_, hh: (0, 0),
                              memory_space=pltpu.VMEM)]
    args += [wz, bz]

    out = pl.pallas_call(
        functools.partial(_conv_kernel_v3, bh=bh, w=wdt, h=h, taps=taps,
                          prologue=prologue, prologue_silu=prologue_silu,
                          apply_silu=apply_silu),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, wdt, co),
                               lambda nn_, hh: (nn_, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hpad, wdt, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(120 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hpad * wdt * c * co * 9,
            bytes_accessed=(2 * n * hpad * wdt * c
                            + n * hpad * wdt * co) * 2,
            transcendentals=n * hpad * wdt * co if apply_silu else 0,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :h]


def conv3x3_v3_eligible(shape, c_out: int) -> bool:
    """v3 kernel gate: same large-spatial decode shapes as v1 (the tap
    construction needs the W-collapse alignment; small-W shapes lose to
    XLA), plus the VMEM budget for the lane-concatenated tap matrix."""
    n, h, w, c = shape
    if w % 16 or w < 256 or h < 8:
        return False
    bh = _pick_block_rows(h, w)
    r = bh * w
    vmem = (9 * c * c_out * 2              # weights (9C, Co)
            + 2 * bh * (w + 2) * c * 2     # two input views
            + 3 * (bh + 2) * w * c * 2     # per-dc collapsed cols
            + (bh + 2) * w * 3 * c * 2     # cols3
            + r * 9 * c * 2                # tap matrix
            + r * c_out * 4                # fp32 accumulator
            + r * c_out * 2)               # output block
    return vmem < 100 * 1024 * 1024


def group_norm_silu_conv3x3(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                            num_groups: int, w: jax.Array, b: jax.Array,
                            eps: float = 1e-5, taps: str = "k9",
                            block_rows: int = 0,
                            interpret: bool = False) -> jax.Array:
    """conv3x3(silu(group_norm(x))) with the GN apply + SiLU fused into the
    conv kernel's prologue — the GN->SiLU->conv chain of ResnetBlock2D /
    the VAE decoder (reference src/models/ stacks) in 1 stats pass + 1
    kernel, no full-tensor HBM round-trip between norm and conv.

    x: (N, H, W, C); gamma/beta: (C,) GN affine; w: (3, 3, C, Co); b: (Co,).
    """
    from tvi.ops.groupnorm import group_norm_stats

    n = x.shape[0]
    c = x.shape[-1]
    cg = c // num_groups
    mean, var = group_norm_stats(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)                # (N, C)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    sc = rstd_c * gamma.astype(jnp.float32)[None]
    bi = beta.astype(jnp.float32)[None] - mean_c * sc
    return conv3x3_pallas_v3(x, w, b, gn_scale=sc, gn_bias=bi,
                             prologue_silu=True, taps=taps,
                             block_rows=block_rows, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("apply_silu", "block_rows",
                                             "interpret"))
def conv3x3_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                   apply_silu: bool = False, block_rows: int = 0,
                   interpret: bool = False) -> jax.Array:
    """x: (N, H, W, C); w: (3, 3, C, Co) (flax nn.Conv layout); b: (Co,).
    Returns SAME-padded stride-1 conv, optionally with fused SiLU."""
    n, h, wdt, c = x.shape
    co = w.shape[-1]
    bh = block_rows or _pick_block_rows(h, wdt)
    hpad = ((h + bh - 1) // bh) * bh
    # pad: +1 halo top / +1 halo bottom plus round-up rows, +1 halo left /
    # right; one extra BH block of rows so the "h+1" view stays in bounds
    xp = jnp.pad(x, ((0, 0), (1, hpad - h + 1 + bh), (1, 1), (0, 0)))
    wz = w.reshape(9, c, co)
    bz = b.reshape(1, co)
    grid = (n, hpad // bh)

    in_block = pl.BlockSpec((1, bh, wdt + 2, c),
                            lambda nn_, hh: (nn_, hh, 0, 0),
                            memory_space=pltpu.VMEM)
    in_block_next = pl.BlockSpec((1, bh, wdt + 2, c),
                                 lambda nn_, hh: (nn_, hh + 1, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, w=wdt, apply_silu=apply_silu),
        grid=grid,
        in_specs=[
            in_block, in_block_next,
            pl.BlockSpec((9, c, co), lambda nn_, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda nn_, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wdt, co),
                               lambda nn_, hh: (nn_, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hpad, wdt, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(110 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hpad * wdt * c * co * 9,
            bytes_accessed=(2 * n * hpad * wdt * c
                            + n * hpad * wdt * co) * 2,
            transcendentals=n * hpad * wdt * co if apply_silu else 0,
        ),
        interpret=interpret,
    )(xp, xp, wz, bz)
    return out[:, :h]
