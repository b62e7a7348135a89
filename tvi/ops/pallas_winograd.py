"""Pallas TPU row-Winograd F(2,3) 3x3 convolution (stride 1, SAME).

Winograd F(2,3) applied along the ROW dimension only, columns kept as the
direct 3-tap lane-concat contraction of the v3 conv kernel
(tvi/ops/pallas_conv.py::_conv_kernel_v3): each pair of output rows is
computed from 4 row-transformed planes instead of 3 row taps over 2 rows,
cutting MACs 6/9 (4 dots on half the rows vs 3 dots on all rows).  The
full F(2x2,3x3) tile (2.25x cut) needs stride-2 COLUMN access, which on
TPU means splitting the sublane dim into (W/2, 2) — a layout Mosaic pads
to death; the row dimension is a major dim where even/odd deinterleaving
is a free reshape+slice, so rows get the transform and columns stay
direct.

Per program (grid (N, Hpad/BH), halo via the two-adjacent-blocks trick):
  window (BH+2, W+2, C) -> 3 column shifts collapsed + lane-concatenated
  to cols3 ((BH+2)*W, 3C) [identical to v3 "k3"] -> reshape
  ((BH+2)/2, 2, W, 3C) exposes even/odd rows -> 4 Winograd row planes
  t_a (BH/2, W, 3C) by VPU adds -> 4 MXU dots with the row-transformed
  weights (4, 3C, Co) -> inverse transform ye=m0+m1+m2, yo=m1-m2-m3
  (coefficients 0/±1/±0.5 — bf16-exact) -> interleave back to (BH, W, Co).

Traffic is identical to direct conv (x read once, y written once); the
win is pure MAC count on a compute-bound bucket (direct kernels measure
43-82 TF/s vs the 149 TF/s MXU ceiling — PERF.md round-3 rooflines).
Isolated A/B before any model wiring per the in-context-inversion law:
scripts/perf_lab.py wg_row_* vs conv_* / pconv3_*.

Replaces (candidate, NOT wired) the reference's torch Conv2d(3,3,pad=1)
sites: diffusers ResnetBlock2D conv1/conv2 and VAE decoder convs
(reference src/models/ stacks), same sites as pallas_conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvi.ops.pallas_conv import _pick_block_rows

# F(2,3) row transform at points {0, 1, -1, inf}: output A^T [(G g) .* (B^T d)]
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], dtype=np.float32)


def winograd_row_weights(w: jax.Array) -> jax.Array:
    """(3, 3, C, Co) -> (4, 3C, Co): G @ w over the row-tap axis, column
    taps flattened dc-major to match the kernel's cols3 lane layout."""
    c, co = w.shape[2], w.shape[3]
    wr = jnp.einsum("ai,ijcd->ajcd", jnp.asarray(_G), w.astype(jnp.float32))
    return wr.reshape(4, 3 * c, co).astype(w.dtype)


def _wg_row_kernel(*refs, bh: int, w: int, h: int, apply_silu: bool,
                   prologue: bool, prologue_silu: bool):
    # xa/xb: consecutive (1, BH, W+2, C) blocks of the padded input; rows
    # [0, BH+2) of their concatenation cover the halo window.
    if prologue:
        xa_ref, xb_ref, sc_ref, bi_ref, w_ref, b_ref, o_ref = refs
    else:
        xa_ref, xb_ref, w_ref, b_ref, o_ref = refs
    hh = pl.program_id(1)
    window = jnp.concatenate([xa_ref[0], xb_ref[0][:2]], axis=0)
    c = window.shape[-1]
    co = w_ref.shape[-1]
    if prologue:
        # GN-apply(+SiLU) on the halo window in VMEM, then re-zero the
        # SAME padding (the affine maps 0 -> bi != 0); same construction
        # as pallas_conv._conv_kernel_v3 (3D iota masks — Mosaic rejects
        # reshaping a 2D i1 vector for the broadcast).
        xf = window.astype(jnp.float32)
        y = xf * sc_ref[0] + bi_ref[0]
        if prologue_silu:
            y = y * jax.nn.sigmoid(y)
        rows = jax.lax.broadcasted_iota(jnp.int32, window.shape, 0) + hh * bh
        colsm = jax.lax.broadcasted_iota(jnp.int32, window.shape, 1)
        valid = ((rows >= 1) & (rows <= h) & (colsm >= 1) & (colsm <= w))
        window = jnp.where(valid, y, 0.0).astype(window.dtype)
    # v3 trick: column shifts collapsed first (normalizes sublane offsets),
    # then lane-concatenated so all three taps ride one contraction axis.
    cols = [window[:, dc:dc + w].reshape((bh + 2) * w, c) for dc in range(3)]
    cols3 = jnp.concatenate(cols, axis=-1)             # ((BH+2)*W, 3C)
    # Even/odd row planes via a free major-dim reshape: local output row
    # pair (2t, 2t+1) reads padded window rows 2t..2t+3 = d0..d3.
    rv = cols3.reshape((bh + 2) // 2, 2, w, 3 * c)
    ht = bh // 2
    d0 = rv[0:ht, 0]
    d1 = rv[0:ht, 1]
    d2 = rv[1:ht + 1, 0]
    d3 = rv[1:ht + 1, 1]
    # B^T d (1D, rows): all-add combinations, bf16-exact coefficients
    t_planes = (d0 - d2, d1 + d2, d2 - d1, d1 - d3)
    r = ht * w
    m = [jax.lax.dot_general(
            t.reshape(r, 3 * c), w_ref[a], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
         for a, t in enumerate(t_planes)]
    bias = b_ref[0].astype(jnp.float32)
    ye = m[0] + m[1] + m[2] + bias                     # A^T rows: even
    yo = m[1] - m[2] - m[3] + bias                     # odd
    if apply_silu:
        ye = ye * jax.nn.sigmoid(ye)
        yo = yo * jax.nn.sigmoid(yo)
    out = jnp.concatenate([ye.reshape(ht, 1, w, co),
                           yo.reshape(ht, 1, w, co)], axis=1)
    o_ref[0] = out.reshape(bh, w, co).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("apply_silu", "prologue_silu",
                                             "block_rows", "interpret"))
def conv3x3_winograd_row(x: jax.Array, w: jax.Array, b: jax.Array,
                         gn_scale: jax.Array | None = None,
                         gn_bias: jax.Array | None = None,
                         apply_silu: bool = False, prologue_silu: bool = True,
                         block_rows: int = 0,
                         interpret: bool = False) -> jax.Array:
    """Row-Winograd SAME 3x3 conv.  x: (N, H, W, C); w: (3, 3, C, Co);
    b: (Co,).  gn_scale/gn_bias: optional per-sample (N, C) fp32
    apply-pass coefficients — when given, computes
    conv3x3(act(x * sc + bi)) in one kernel (v3-prologue-compatible).
    Requires W % 16 == 0 (the column-collapse alignment rule shared with
    pallas_conv); H is padded up to the row block."""
    n, h, wdt, c = x.shape
    co = w.shape[-1]
    if wdt % 16 or h < 2:
        # fail loudly instead of an opaque Mosaic layout error (ADVICE r4):
        # the (W+2)-lane column collapse needs W % 16 == 0, same rule as
        # pallas_conv.conv3x3_eligible; degenerate H has no row pairs.
        raise ValueError(
            f"conv3x3_winograd_row requires W % 16 == 0 and H >= 2, got "
            f"H={h}, W={wdt}")
    prologue = gn_scale is not None
    bh = block_rows or _pick_block_rows(h, wdt)
    bh = max(8, (bh // 2) * 2)            # row pairs
    hpad = ((h + bh - 1) // bh) * bh
    xp = jnp.pad(x, ((0, 0), (1, hpad - h + 1 + bh), (1, 1), (0, 0)))
    wz = winograd_row_weights(w)
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
        sc = gn_scale.reshape(n, 1, c).astype(jnp.float32)
        bi = gn_bias.reshape(n, 1, c).astype(jnp.float32)
        stat_spec = pl.BlockSpec((1, 1, c), lambda nn_, hh: (nn_, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [stat_spec, stat_spec]
        args += [sc, bi]
    in_specs += [pl.BlockSpec((4, 3 * c, co), lambda nn_, hh: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, co), lambda nn_, hh: (0, 0),
                              memory_space=pltpu.VMEM)]
    args += [wz, bz]
    out = pl.pallas_call(
        functools.partial(_wg_row_kernel, bh=bh, w=wdt, h=h,
                          apply_silu=apply_silu, prologue=prologue,
                          prologue_silu=prologue_silu),
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
            flops=2 * n * hpad * wdt * c * co * 6,
            bytes_accessed=(2 * n * hpad * wdt * c
                            + n * hpad * wdt * co) * 2,
            transcendentals=n * hpad * wdt * co if apply_silu else 0,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :h]


def group_norm_silu_winograd_row(x: jax.Array, gamma: jax.Array,
                                 beta: jax.Array, num_groups: int,
                                 w: jax.Array, b: jax.Array,
                                 eps: float = 1e-5, block_rows: int = 0,
                                 interpret: bool = False) -> jax.Array:
    """conv3x3(silu(group_norm(x))) with GN apply + SiLU fused into the
    row-Winograd kernel's prologue — drop-in for
    pallas_conv.group_norm_silu_conv3x3 at the ResnetBlock2D / VAE decoder
    GN->SiLU->conv chains (reference src/models/ stacks)."""
    from tvi.ops.groupnorm import group_norm_stats

    c = x.shape[-1]
    cg = c // num_groups
    mean, var = group_norm_stats(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)
    sc = jnp.repeat(rstd, cg, axis=-1) * gamma.astype(jnp.float32)[None]
    bi = (beta.astype(jnp.float32)[None]
          - jnp.repeat(mean, cg, axis=-1) * sc)
    return conv3x3_winograd_row(x, w, b, gn_scale=sc, gn_bias=bi,
                                prologue_silu=True, block_rows=block_rows,
                                interpret=interpret)
