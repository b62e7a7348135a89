"""Perf lab — TPU micro-benchmarks driving the round-2 kernel work.

Each experiment is a separately-jitted program (remote AOT compile costs
minutes per program through the axon tunnel, so variants are selected by
argv and results cached via the persistent compile cache).  Timing folds the
iteration loop inside one jit (fori_loop with a data dependency) and syncs
via scalar readback — block_until_ready does not synchronize through the
tunnel (see PERF.md).

Usage: python scripts/perf_lab.py attn_base attn_exp2 mm_d64 ...
       python scripts/perf_lab.py all_attn
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# repo-local default: /tmp is wiped between containers, /root/repo persists
_REPO_TPU_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "tpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TVI_JAX_CACHE", _REPO_TPU_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# headline spatial self-attention shape: B*F=50, 5 heads, S=72*128, D=64
BH, S, D = 250, 9216, 64
ITERS = int(os.environ.get("TVI_LAB_ITERS", 20))
LOG2E = 1.4426950408889634


def report(name, seconds_per_iter, flops):
    tf = flops / seconds_per_iter / 1e12
    print(f"[{name}] {seconds_per_iter*1e3:8.3f} ms/iter  {tf:7.1f} TFLOP/s",
          flush=True)


def bench_attention(name, kernel_fn, block_q=128, iters=ITERS):
    q = jax.random.normal(jax.random.PRNGKey(0), (BH, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)
    scale = D ** -0.5

    call = functools.partial(_attn_call, kernel_fn, block_q, scale)

    @jax.jit
    def run(q, k, v):
        # k/v must be ARGUMENTS: closed-over arrays are baked into the HLO
        # as literals and overflow the remote-compile tunnel (HTTP 413)
        return jax.lax.fori_loop(0, iters, lambda i, cur: call(cur, k, v), q)

    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))  # compile + warm
    t0 = time.perf_counter()
    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 4 * BH * S * S * D)


def _attn_call(kernel_fn, block_q, scale, q, k, v):
    grid = (BH, S // block_q)
    return pl.pallas_call(
        functools.partial(kernel_fn, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=4 * BH * S * D * 2,
            transcendentals=BH * S * S,
        ),
    )(q, k, v)


# ------------------------- kernel variants ---------------------------------

def k_base(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def k_exp2(q_ref, k_ref, v_ref, o_ref, *, scale):
    # softmax via exp2: exp(x) = exp2(x * log2 e); fold log2 e into the scale
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * (scale * LOG2E)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def k_exp2_bf16(q_ref, k_ref, v_ref, o_ref, *, scale):
    # exp2 computed in bf16 (p only feeds a bf16 matmul anyway)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * (scale * LOG2E)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2((logits - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def k_noexp(q_ref, k_ref, v_ref, o_ref, *, scale):
    # MXU-only ceiling probe: matmuls + cast, softmax replaced by a scale
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale
    o = jax.lax.dot_general(
        logits.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o * (1.0 / S)).astype(o_ref.dtype)


def k_nomax(q_ref, k_ref, v_ref, o_ref, *, scale):
    # exp2 without the running-max subtraction (numerics unsafe; cost probe)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * (scale * LOG2E)
    p = jnp.exp2(logits)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def k_qpair(q_ref, k_ref, v_ref, o_ref, *, scale):
    # two independent 128-row halves inside one program: gives the Mosaic
    # scheduler ILP to overlap half A's softmax (VPU) with half B's matmuls
    # (MXU)
    k, v = k_ref[0], v_ref[0]

    def half(q):
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * (scale * LOG2E)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return o / l

    o0 = half(q_ref[0, :128])
    o1 = half(q_ref[0, 128:])
    o_ref[0] = jnp.concatenate([o0, o1], axis=0).astype(o_ref.dtype)


def k_gmax(q_ref, k_ref, v_ref, o_ref, *, scale):
    # per-row max costs ~22ms/call at the headline shape: the (BQ,1)->(BQ,S)
    # lane-broadcast subtract is a full extra pass over the 4.7MB logits
    # tile (measured: base 63.6 vs nomax 85.9 TFLOP/s).  A GLOBAL tile max
    # is a lane-uniform scalar: splat-subtract is free, overflow-safety
    # identical (logits - m <= 0 everywhere).
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * (scale * LOG2E)
    m = jnp.max(logits)
    p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def bench_attention_qkbound(name, block_q=256, iters=ITERS):
    """Softmax shifted by a PRE-COMPUTED per-row upper bound instead of the
    row max: shift_i = scale*log2e * ||q_i|| * max_j ||k_j||.  Any row-wise
    shift cancels exactly in p/sum(p); this one needs no post-matmul
    reduction, so the subtract+exp2 can fuse into the QK epilogue (the
    measured nomax ceiling)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (BH, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)
    scale = D ** -0.5

    def kernel(q_ref, k_ref, v_ref, kn_ref, o_ref):
        qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]
        c = scale * LOG2E
        qn = jnp.sqrt(jnp.sum(jnp.square(qb.astype(jnp.float32)),
                              axis=-1, keepdims=True))
        shift = qn * (kn_ref[0, 0, 0] * c)                   # (BQ, 1)
        logits = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * c
        p = jnp.exp2(logits - shift)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        o_ref[0] = (o / l).astype(o_ref.dtype)

    def call(q, k, v, knorm):
        return pl.pallas_call(
            kernel,
            grid=(BH, S // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(100 * 1024 * 1024),
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * BH * S * S * D,
                bytes_accessed=4 * BH * S * D * 2,
                transcendentals=BH * S * S,
            ),
        )(q, k, v, knorm)

    def knorm_of(k):
        return jnp.max(jnp.linalg.norm(k.astype(jnp.float32), axis=-1),
                       axis=-1)[:, None, None]            # (BH, 1, 1)

    @jax.jit
    def run(q, k, v):
        knorm = knorm_of(k)
        return jax.lax.fori_loop(
            0, iters, lambda i, cur: call(cur, k, v, knorm), q)

    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 4 * BH * S * S * D)

    # numerics: compare against the row-max reference on the same inputs
    ref = _attn_call(k_base, 128, scale, q, k, v)
    got = call(q, k, v, knorm_of(k))
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"[{name}] max |diff| vs row-max softmax: {float(err):.2e}",
          flush=True)


# ------------------------- VAE decode triage --------------------------------

def bench_decode(name, chunk=5, no_gn=False, ablate="", frames=25,
                 height=576, width=1024, iters=2):
    import flax.linen as nn

    os.environ["TVI_ABLATE"] = ablate
    orig_call = nn.GroupNorm.__call__
    if no_gn:
        nn.GroupNorm.__call__ = lambda self, x, *a, **kw: x
    try:
        from tvi.core.config import VAEConfig
        from tvi.models.vae import AutoencoderKLTemporalDecoder

        cfg = VAEConfig()
        vae = AutoencoderKLTemporalDecoder(cfg, dtype=jnp.bfloat16,
                                           param_dtype=jnp.bfloat16)
        params = vae.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.bfloat16), 1)
        h, w = height // 8, width // 8
        z = jax.random.normal(jax.random.PRNGKey(1), (frames, h, w, 4),
                              jnp.bfloat16)

        @jax.jit
        def decode(params, z):
            zc = z.reshape(frames // chunk, chunk, h, w, 4)
            return jax.lax.map(
                lambda c: vae.apply(params, c / cfg.scaling_factor,
                                    c.shape[0], method=vae.decode), zc)

        out = decode(params, z)
        float(jnp.float32(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = decode(params, z)
        float(jnp.float32(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"[{name}] {dt*1e3:8.1f} ms/decode ({frames}f {width}x{height},"
              f" chunk {chunk}, no_gn={no_gn}, ablate='{ablate}')", flush=True)
    finally:
        nn.GroupNorm.__call__ = orig_call
        os.environ.pop("TVI_ABLATE", None)


# ------------------------- matmul ceilings ----------------------------------

def bench_matmul(name, m, k, n, iters=ITERS):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def body(i, a):
            c = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            # fold a scalar of c back into a: keeps the loop sequential
            # without shape games (works for any m/k/n)
            return a + (c[0, 0] * 1e-9).astype(a.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


EXPERIMENTS = {}


def exp(name):
    def deco(fn):
        EXPERIMENTS[name] = fn
        return fn
    return deco


exp("attn_base")(lambda: bench_attention("attn_base", k_base))
exp("attn_exp2")(lambda: bench_attention("attn_exp2", k_exp2))
exp("attn_exp2_bf16")(lambda: bench_attention("attn_exp2_bf16", k_exp2_bf16))
exp("attn_noexp")(lambda: bench_attention("attn_noexp", k_noexp))
exp("attn_nomax")(lambda: bench_attention("attn_nomax", k_nomax))
exp("attn_qpair")(lambda: bench_attention("attn_qpair", k_qpair, block_q=256))
exp("attn_exp2_bq256")(lambda: bench_attention("attn_exp2_bq256", k_exp2,
                                               block_q=256))
exp("attn_qkbound")(lambda: bench_attention_qkbound("attn_qkbound"))
exp("attn_qkbound_bq128")(lambda: bench_attention_qkbound(
    "attn_qkbound_bq128", block_q=128))
exp("attn_gmax")(lambda: bench_attention("attn_gmax", k_gmax))
exp("attn_gmax_bq256")(lambda: bench_attention("attn_gmax_bq256", k_gmax,
                                               block_q=256))
exp("dec_base")(lambda: bench_decode("dec_base", chunk=5))
exp("dec_chunk25")(lambda: bench_decode("dec_chunk25", chunk=25))
exp("dec_nogn")(lambda: bench_decode("dec_nogn", chunk=5, no_gn=True))
exp("dec_notemporal")(lambda: bench_decode("dec_notemporal", chunk=5,
                                           ablate="temporal_resnet"))
def bench_matmul_int8(name, m, k, n, iters=ITERS):
    """int8 x int8 -> int32 MXU ceiling probe (v5e nominal ~394 TOPS)."""
    a = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)

    @jax.jit
    def run(a, b):
        def body(i, a):
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (a + (c[0, 0] % 3).astype(jnp.int8)).astype(jnp.int8)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


exp("mm_int8")(lambda: bench_matmul_int8("mm_int8 (8192,8192)x(8192,8192)",
                                         8192, 8192, 8192))
exp("mm_bf16_16k")(lambda: bench_matmul("mm_bf16_16k (16k,16k)x(16k,16k)",
                                        16384, 16384, 16384, iters=8))


def bench_matmul_true(name, m, k, n, iters=ITERS, int8=False):
    """TRUE roofline probe: the loop carry consumes the FULL product.

    The original bench_matmul carried only c[0, 0] — XLA's algebraic
    simplifier can narrow slice(dot) to dot(slice), so its numbers
    (notably 'mm_bf16_16k 1297 TF/s') may measure a sliver of the matmul.
    Here A <- A + eps*C keeps every output element live.  The elementwise
    add costs ~3 HBM passes of A per iter — negligible vs compute at
    these sizes.
    """
    if int8:
        a = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127,
                               jnp.int8)
        b = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127,
                               jnp.int8)

        @jax.jit
        def run(a, b):
            def body(i, a):
                c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return (a ^ (c % 2).astype(jnp.int8)).astype(jnp.int8)
            return jax.lax.fori_loop(0, iters, body, a)
    else:
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

        @jax.jit
        def run(a, b):
            def body(i, a):
                c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.DEFAULT)
                if n >= k:
                    dep = c[:, :k]
                else:
                    reps = (k + n - 1) // n
                    dep = jnp.concatenate([c] * reps, axis=1)[:, :k]
                return (a + dep * 1e-9).astype(a.dtype)
            return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


exp("mmt_bf16_4k")(lambda: bench_matmul_true("mmt_bf16_4k", 4096, 4096, 4096))
exp("mmt_bf16_8k")(lambda: bench_matmul_true("mmt_bf16_8k", 8192, 8192, 8192,
                                             iters=10))
exp("mmt_bf16_16k")(lambda: bench_matmul_true("mmt_bf16_16k",
                                              16384, 16384, 16384, iters=4))
exp("mmt_int8_8k")(lambda: bench_matmul_true("mmt_int8_8k", 8192, 8192, 8192,
                                             iters=10, int8=True))
exp("mmt_int8_16k")(lambda: bench_matmul_true("mmt_int8_16k",
                                              16384, 16384, 16384, iters=4,
                                              int8=True))


def bench_hbm_bw(name, gb=2.0, iters=20):
    """HBM bandwidth probe: y = x * a + b elementwise over a large buffer,
    full dependency.  Traffic per iter = read + write = 2 * size."""
    n = int(gb * 1e9 / 2)  # bf16 elements
    rows = n // 4096
    x = jnp.ones((rows, 4096), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, cur):
            return cur * jnp.bfloat16(0.9999) + jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    tbs = 2 * rows * 4096 * 2 / dt / 1e12
    print(f"[{name}] {dt*1e3:8.3f} ms/iter  {tbs:7.3f} TB/s eff (r+w)",
          flush=True)


exp("hbm_bw")(lambda: bench_hbm_bw("hbm_bw 2GB"))
exp("hbm_bw_8g")(lambda: bench_hbm_bw("hbm_bw_8g", gb=8.0, iters=10))


def _mm_int8_pallas_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)


def bench_matmul_int8_pallas(name, m=8192, k=8192, n=8192, bm=1024, bn=512,
                             iters=10):
    """Mosaic-native int8 matmul: does Pallas reach the nominal int8 MXU
    rate where XLA's int8 dot lowering (mmt_int8: 96 TOPS) does not?"""
    a = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)

    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            _mm_int8_pallas_kernel,
            grid=(m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=int(100 * 1024 * 1024)),
        )(a, b)

    @jax.jit
    def run(a, b):
        def body(i, a):
            c = mm(a, b)
            return (a ^ (c % 2).astype(jnp.int8)).astype(jnp.int8)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


exp("mm_int8_pallas")(lambda: bench_matmul_int8_pallas("mm_int8_pallas 8k"))


def bench_matmul_w8(name, m=46080, k=1280, n=1280, iters=20):
    """W8A16 probe: int8 weights dequantized to bf16 on the fly, bf16 MXU
    compute — halves WEIGHT HBM traffic without the int8-dot slowness.
    Shape default = the C=1280 FF layer rows at headline geometry."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    bi = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)
    bs = jax.random.normal(jax.random.PRNGKey(2), (1, n), jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, bi, bs):
        def body(i, a):
            b = bi.astype(jnp.bfloat16) * bs
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            return (a + c * 1e-9).astype(a.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, bi, bs)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, bi, bs)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


exp("mm_w8_ff1280")(lambda: bench_matmul_w8("mm_w8_ff1280"))
exp("mm_bf16_ff1280")(lambda: bench_matmul_true("mm_bf16_ff1280",
                                                46080, 1280, 1280))


def _mm_resident_kernel(a_ref, b_ref, o_ref, *, inner: int):
    a = a_ref[...]
    b = b_ref[...]
    acc = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    for _ in range(inner - 1):
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    o_ref[...] = acc.astype(o_ref.dtype)


def bench_mm_resident(name, m=8192, k=1152, n=128, inner=32, iters=5):
    """Pure-MXU rate for ONE VMEM-resident matmul shape: the kernel loops
    `inner` accumulating dots over the same resident operands — no DMA, no
    relayout, no epilogue.  Isolates 'is the conv kernel's (M,9C)x(9C,Co)
    contraction itself the wall?'."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.01

    mm = pl.pallas_call(
        functools.partial(_mm_resident_kernel, inner=inner),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
    )

    @jax.jit
    def run(a, b):
        def body(i, cur):
            o = mm(cur, b)
            return (cur + o[:, :k] * 1e-9 if n >= k
                    else cur + jnp.pad(o, ((0, 0), (0, k - n))) * 1e-9
                    ).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / (iters * inner)
    report(name, dt, 2 * m * k * n)


exp("mmr_conv_up3")(lambda: bench_mm_resident("mmr_conv_up3 (8192,1152)x(.,128)"))
exp("mmr_conv_n512")(lambda: bench_mm_resident("mmr_conv_n512", n=512))
exp("mmr_conv_k384")(lambda: bench_mm_resident("mmr_conv_k384", k=384))
exp("mmr_attnff")(lambda: bench_mm_resident("mmr_attnff (8192,320)x(.,1280)",
                                            k=320, n=1280))
exp("mmr_square1k")(lambda: bench_mm_resident("mmr_square1k", m=8192, k=1024,
                                              n=1024, inner=16))


def _mm_bf16_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT).astype(o_ref.dtype)


def bench_mm_pallas(name, m, k, n, bm=1024, bn=512, iters=10,
                    out_dtype=jnp.bfloat16):
    """Gridded Pallas bf16 GEMM at model matmul shapes.  mm_int8_pallas
    (gridded) beat XLA by 1.3x at 8k^3; does the same hold for the bf16
    transformer-shaped matmuls where XLA sustains only ~50 TF/s?"""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02

    mm = pl.pallas_call(
        _mm_bf16_kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=int(100 * 1024 * 1024)),
    )

    @jax.jit
    def run(a, b):
        def body(i, cur):
            c = mm(cur, b)
            if n >= k:
                return (cur + c[:, :k].astype(jnp.float32) * 1e-9).astype(cur.dtype)
            reps = (k + n - 1) // n
            wide = jnp.concatenate([c] * reps, axis=1)[:, :k]
            return (cur + wide.astype(jnp.float32) * 1e-9).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(a, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * k * n)


def bench_fused_ff(name, m=460800, c=320, inner=1280, iters=10, fused=True):
    """Whole-FF kernel vs unfused LN + geglu-kernel + XLA out-proj chain."""
    from tvi.ops.pallas_fused_ff import fused_feedforward
    from tvi.ops.pallas_geglu import geglu_project

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (m, c), jnp.bfloat16)
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 2 * inner), jnp.bfloat16) * 0.03
    b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
    w2 = jax.random.normal(ks[2], (inner, c), jnp.bfloat16) * 0.03
    b2 = jnp.zeros((c,), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, cur):
            if fused:
                y = fused_feedforward(cur, lns, lnb, w1, b1, w2, b2)
            else:
                mean = jnp.mean(cur.astype(jnp.float32), -1, keepdims=True)
                var = jnp.mean(jnp.square(cur.astype(jnp.float32)), -1,
                               keepdims=True) - jnp.square(mean)
                h = ((cur.astype(jnp.float32) - mean)
                     * jax.lax.rsqrt(var + 1e-5) * lns + lnb).astype(cur.dtype)
                g = geglu_project(h, w1, b1)
                y = (g @ w2 + b2) + cur
            return (0.999 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * m * c * 2 * inner + 2 * m * inner * c)


exp("fff_320")(lambda: bench_fused_ff("fff_320 (460800,320,i1280)"))
exp("fff_320_unfused")(lambda: bench_fused_ff("fff_320_unfused", fused=False))
exp("fff_640")(lambda: bench_fused_ff("fff_640", m=115200, c=640, inner=2560))
exp("fff_640_unfused")(lambda: bench_fused_ff("fff_640_unfused", m=115200,
                                              c=640, inner=2560, fused=False))
exp("fff_1280")(lambda: bench_fused_ff("fff_1280", m=28800, c=1280,
                                       inner=5120))
exp("fff_1280_unfused")(lambda: bench_fused_ff(
    "fff_1280_unfused", m=28800, c=1280, inner=5120, fused=False))
exp("unet_fwd_fusedff")(lambda: bench_unet_fwd(
    "unet_fwd_fusedff", env={"TVI_FUSED_FF": "1"}))
exp("unet_fwd_nofusedff")(lambda: bench_unet_fwd(
    "unet_fwd_nofusedff", env={"TVI_FUSED_FF": "0"}))
exp("unet_fwd_nofusedcross")(lambda: bench_unet_fwd(
    "unet_fwd_nofusedcross", env={"TVI_DISABLE_FUSED_CROSS": "1"}))
exp("unet_fwd_noattnout")(lambda: bench_unet_fwd(
    "unet_fwd_noattnout", env={"TVI_DISABLE_ATTN_OUT": "1"}))
exp("unet_fwd_noflat")(lambda: bench_unet_fwd(
    "unet_fwd_noflat", env={"TVI_TEMPORAL_FLAT": "0"}))


def bench_attn_out(name, b=50, s=9216, heads=5, c=0, iters=10, block_q=0):
    """Spatial v4 kernel (attention + fused out-proj/residual epilogue) at
    the model's spatial shapes."""
    from tvi.ops.pallas_attention_out import flash_attention_out

    c = c or heads * 64
    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    q = mk(0, (b, s, inner), 0.3)
    k = mk(1, (b, s, inner), 0.3)
    v = mk(2, (b, s, inner), 0.3)
    x = mk(3, (b, s, c))
    wo = mk(4, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)

    @jax.jit
    def run(q, k, v, x, wo, bo):
        def body(i, cur):
            out = flash_attention_out(q, k, v, cur, wo, bo, heads=heads,
                                      scale=64 ** -0.5, block_q=block_q)
            return (0.99 * out).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(q, k, v, x, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(q, k, v, x, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * 2 * b * s * s * inner + 2 * b * s * inner * c
    report(name, dt, flops)


def bench_attn_out_packed(name, b=50, s=9216, heads=5, c=0, iters=10,
                          block_q=0):
    """The DEFAULT serving variant: fused-QKV (B,S,3*inner) buffer in, per-
    head slices taken in-kernel (flash_attention_out_packed).  Its VMEM
    profile differs from the split kernel (full-S 3*inner resident block),
    so the block_q optimum must be measured here, not inferred."""
    from tvi.ops.pallas_attention_out import flash_attention_out_packed

    c = c or heads * 64
    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    qkv = mk(0, (b, s, 3 * inner), 0.3)
    x = mk(1, (b, s, c))
    wo = mk(2, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)

    @jax.jit
    def run(qkv, x, wo, bo):
        def body(i, cur):
            out = flash_attention_out_packed(qkv, cur, wo, bo, heads=heads,
                                             scale=64 ** -0.5,
                                             block_q=block_q)
            return (0.99 * out).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(qkv, x, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(qkv, x, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * 2 * b * s * s * inner + 2 * b * s * inner * c
    report(name, dt, flops)


for _bq in (128, 192, 256):
    exp(f"attn_outp_320_bq{_bq}")(functools.partial(
        bench_attn_out_packed, f"attn_outp_320_bq{_bq} (50,9216,i320)",
        block_q=_bq))
    exp(f"attn_outp_640_bq{_bq}")(functools.partial(
        bench_attn_out_packed, f"attn_outp_640_bq{_bq} (50,2304,i640)",
        s=2304, heads=10, block_q=_bq))

exp("attn_out_320")(lambda: bench_attn_out("attn_out_320 (50,9216,i320)"))
exp("attn_out_640")(lambda: bench_attn_out(
    "attn_out_640 (50,2304,i640)", s=2304, heads=10))
exp("attn_out_1280")(lambda: bench_attn_out(
    "attn_out_1280 (50,576,i1280)", s=576, heads=20))

# block_q sweep on the default v4 kernel (BLOCK_Q=256): the level-0 shape
# is the biggest step bucket (518 ms spatial attention at 80.8 TF/s vs the
# ~98 TF/s d=64 ceiling) — probe whether a bigger/smaller q block moves
# the kernel rate before touching the kernel itself.
for _bq in (64, 96, 128, 192, 384, 512, 768):
    exp(f"attn_out_320_bq{_bq}")(functools.partial(
        bench_attn_out, f"attn_out_320_bq{_bq} (50,9216,i320)",
        block_q=_bq))
# same sweep at the other two level shapes (separate optima: the logits
# tile is (BQ, S) fp32 — S and head count change the VMEM pressure)
for _bq in (64, 96, 128, 192, 256):
    exp(f"attn_out_640_bq{_bq}")(functools.partial(
        bench_attn_out, f"attn_out_640_bq{_bq} (50,2304,i640)",
        s=2304, heads=10, block_q=_bq))
for _bq in (64, 96, 144, 192, 288):
    exp(f"attn_out_1280_bq{_bq}")(functools.partial(
        bench_attn_out, f"attn_out_1280_bq{_bq} (50,576,i1280)",
        s=576, heads=20, block_q=_bq))


exp("mmp_8k")(lambda: bench_mm_pallas("mmp_8k", 8192, 8192, 8192))
exp("mmp_ff1280")(lambda: bench_mm_pallas("mmp_ff1280", 46080, 1280, 1280))
exp("mmp_ff320_in")(lambda: bench_mm_pallas("mmp_ff320_in (460800,320,2560)",
                                            460800, 320, 2560, bm=2048))
exp("mmp_ff320_out")(lambda: bench_mm_pallas("mmp_ff320_out (460800,1280,320)",
                                             460800, 1280, 320, bm=2048,
                                             bn=320))
exp("mmp_proj320")(lambda: bench_mm_pallas("mmp_proj320 (460800,320,320)",
                                           460800, 320, 320, bm=2048, bn=320))
# In-kernel thin-N sweep: is the limiter the N width itself or its 128-lane
# alignment?  bn == n (single N block, weights resident), M-gridded.
for _n, _bm in ((320, 4096), (384, 4096), (640, 4096), (960, 2048),
                (1152, 2048), (1280, 2048), (2560, 1024)):
    exp(f"mmpN_{_n}")(lambda n=_n, bm=_bm: bench_mm_pallas(
        f"mmpN_{n} (458752,320,{n}) bm{bm}", 458752, 320, n, bm=bm, bn=n))
# and the out-projection shape class (K wide, N thin)
for _n, _bm in ((320, 2048), (384, 2048)):
    exp(f"mmpKN_{_n}")(lambda n=_n, bm=_bm: bench_mm_pallas(
        f"mmpKN_{n} (458752,1280,{n}) bm{bm}", 458752, 1280, n, bm=bm, bn=n))
# block-size sweep at the N=320 cliff shape: the fused-FF kernel's bm=512
# programs run ~1.6x off peak while bm=4096 single-dot programs run 10x off
for _bm in (128, 256, 512, 1024):
    exp(f"mmpB_{_bm}")(lambda bm=_bm: bench_mm_pallas(
        f"mmpB_{bm} (458752,320,320) bm{bm}", 458752, 320, 320,
        bm=bm, bn=320))
    exp(f"mmpBK_{_bm}")(lambda bm=_bm: bench_mm_pallas(
        f"mmpBK_{bm} (458752,1280,320) bm{bm}", 458752, 1280, 320,
        bm=bm, bn=320))
def bench_matmul_3d(name, b, s, k, n, iters=10, transpose_b=False):
    """The model's projections are (B, S, K) x (K, N) — does XLA tile the
    3D/batched form differently from the equivalent 2D (B*S, K) GEMM?"""
    a = jax.random.normal(jax.random.PRNGKey(0), (b, s, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (n, k) if transpose_b else (k, n), jnp.bfloat16)

    @jax.jit
    def run(a, w):
        def body(i, a):
            if transpose_b:
                c = jax.lax.dot_general(a, w, (((2,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.DEFAULT)
            else:
                c = jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.DEFAULT)
            if n >= k:
                dep = c[..., :k]
            else:
                reps = (k + n - 1) // n
                dep = jnp.concatenate([c] * reps, axis=-1)[..., :k]
            return (a + dep * 1e-9).astype(a.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    out = run(a, w)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(a, w)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * b * s * k * n)


exp("mm3d_proj320")(lambda: bench_matmul_3d("mm3d_proj320 (50,9216,320)x(320,320)",
                                            50, 9216, 320, 320))
exp("mm3d_out320")(lambda: bench_matmul_3d("mm3d_out320 (50,9216,1280)x(1280,320)",
                                           50, 9216, 1280, 320))
exp("mmT_proj320")(lambda: bench_matmul_3d("mmT_proj320 wT-layout",
                                           50, 9216, 320, 320,
                                           transpose_b=True))
exp("mm_bf16_n384")(lambda: bench_matmul_true(
    "mm_bf16_n384 (460800,320,384)", 460800, 320, 384, iters=10))
exp("mm_bf16_n512")(lambda: bench_matmul_true(
    "mm_bf16_n512 (460800,320,512)", 460800, 320, 512, iters=10))
exp("mm_bf16_n960")(lambda: bench_matmul_true(
    "mm_bf16_n960 qkv-fused (460800,320,960)", 460800, 320, 960, iters=10))
exp("mm_bf16_n1024")(lambda: bench_matmul_true(
    "mm_bf16_n1024 (460800,320,1024)", 460800, 320, 1024, iters=10))
exp("mm_bf16_out384")(lambda: bench_matmul_true(
    "mm_bf16_out384 (460800,1280,384)", 460800, 1280, 384, iters=10))
exp("mm_bf16_k384n384")(lambda: bench_matmul_true(
    "mm_bf16_k384n384", 460800, 384, 384, iters=10))
exp("mm_bf16_m46k_n320")(lambda: bench_matmul_true(
    "mm_bf16_m46k_n320 (46080,1280,320)", 46080, 1280, 320, iters=10))
exp("mm_bf16_ff320_in")(lambda: bench_matmul_true(
    "mm_bf16_ff320_in", 460800, 320, 2560, iters=10))
exp("mm_bf16_ff320_out")(lambda: bench_matmul_true(
    "mm_bf16_ff320_out", 460800, 1280, 320, iters=10))
exp("mm_bf16_proj320")(lambda: bench_matmul_true(
    "mm_bf16_proj320", 460800, 320, 320, iters=10))


def bench_conv_v3(name, n=5, h=576, w=1024, cin=128, cout=128, iters=10,
                  taps="k9", block_rows=0, gn=False):
    from tvi.ops.pallas_conv import conv3x3_pallas_v3, group_norm_silu_conv3x3

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.bfloat16)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                           jnp.bfloat16) * 0.05
    b = jnp.zeros((cout,), jnp.bfloat16)
    gamma = jnp.ones((cin,), jnp.float32)
    beta = jnp.zeros((cin,), jnp.float32)

    @jax.jit
    def run(x, wt, b):
        def body(i, cur):
            if gn:
                y = group_norm_silu_conv3x3(cur, gamma, beta, 32, wt, b,
                                            taps=taps, block_rows=block_rows)
            else:
                y = conv3x3_pallas_v3(cur, wt, b, taps=taps,
                                      block_rows=block_rows)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, wt, b)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x, wt, b)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * w * cin * cout * 9)


exp("pconv3_up3_k9")(lambda: bench_conv_v3("pconv3_up3_k9 (5,576,1024,128)"))
exp("pconv3_up3_k3")(lambda: bench_conv_v3("pconv3_up3_k3", taps="k3"))
exp("pconv3_up3_k9_bh16")(lambda: bench_conv_v3("pconv3_up3_k9_bh16",
                                                block_rows=16))
exp("pconv3_up3_k9_gn")(lambda: bench_conv_v3("pconv3_up3_k9_gn", gn=True))
exp("pconv3_up2_k9")(lambda: bench_conv_v3("pconv3_up2_k9 (5,288,512,256)",
                                           h=288, w=512, cin=256, cout=256))
exp("pconv3_up2_k3")(lambda: bench_conv_v3("pconv3_up2_k3", h=288, w=512,
                                           cin=256, cout=256, taps="k3"))
exp("pconv3_up2_k9_gn")(lambda: bench_conv_v3("pconv3_up2_k9_gn", h=288,
                                              w=512, cin=256, cout=256,
                                              gn=True))
exp("pconv3_mid_k9")(lambda: bench_conv_v3("pconv3_mid_k9 (5,72,128,512)",
                                           h=72, w=128, cin=512, cout=512))
exp("pconv3_unet320_k9")(lambda: bench_conv_v3(
    "pconv3_unet320_k9 (50,72,128,320)", n=50, h=72, w=128, cin=320,
    cout=320))
exp("pconv3_unet320_k3")(lambda: bench_conv_v3(
    "pconv3_unet320_k3", n=50, h=72, w=128, cin=320, cout=320, taps="k3"))


def bench_conv(name, n=5, h=576, w=1024, cin=128, cout=128, iters=10):
    """XLA 3x3 conv ceiling probe at the decode up-block geometry."""
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.bfloat16)
    conv = nn.Conv(cout, (3, 3), padding=1, dtype=jnp.bfloat16,
                   param_dtype=jnp.bfloat16)
    params = conv.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def run(params, x):
        def body(i, cur):
            y = conv.apply(params, cur)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(params, x)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(params, x)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * w * cin * cout * 9)


exp("conv_up3")(lambda: bench_conv("conv_up3 (5,576,1024,128)x3x3"))
exp("conv_up2")(lambda: bench_conv("conv_up2 (5,288,512,256)x3x3",
                                   h=288, w=512, cin=256, cout=256))
exp("conv_mid")(lambda: bench_conv("conv_mid (5,72,128,512)x3x3",
                                   h=72, w=128, cin=512, cout=512))
exp("conv_unet320")(lambda: bench_conv("conv_unet320 (50,72,128,320)x3x3",
                                       n=50, h=72, w=128, cin=320, cout=320))


def bench_attn_streamed(name, block_q=256, block_k=1024, iters=10):
    from tvi.ops.pallas_attention import flash_self_attention_streamed

    q = jax.random.normal(jax.random.PRNGKey(0), (BH, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, cur):
            o = flash_self_attention_streamed(cur, k, v, D ** -0.5,
                                              block_q=block_q,
                                              block_k=block_k)
            return (cur + 0.001 * o).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 4 * BH * S * S * D)


def bench_conv_pallas(name, n=5, h=576, w=1024, cin=128, cout=128, iters=10,
                      block_rows=0):
    from tvi.ops.pallas_conv import conv3x3_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.bfloat16)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                           jnp.bfloat16) * 0.05
    b = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def run(x, wt, b):
        def body(i, cur):
            # block_rows is an explicit static arg (NOT a module global):
            # the jit cache key must differ per variant (see CLAUDE.md)
            y = conv3x3_pallas(cur, wt, b, block_rows=block_rows)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, wt, b)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x, wt, b)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * w * cin * cout * 9)


exp("pconv_up3_bh16")(lambda: bench_conv_pallas(
    "pconv_up3_bh16", block_rows=16))
exp("pconv_up3_bh4")(lambda: bench_conv_pallas(
    "pconv_up3_bh4", block_rows=4))
exp("pconv_up3")(lambda: bench_conv_pallas("pconv_up3 (5,576,1024,128)"))
exp("pconv_up2")(lambda: bench_conv_pallas("pconv_up2 (5,288,512,256)",
                                           h=288, w=512, cin=256, cout=256))
exp("pconv_mid")(lambda: bench_conv_pallas("pconv_mid (5,72,128,512)",
                                           h=72, w=128, cin=512, cout=512))
exp("pconv_unet320")(lambda: bench_conv_pallas(
    "pconv_unet320 (50,72,128,320)", n=50, h=72, w=128, cin=320, cout=320))
exp("dec_pconv")(lambda: bench_decode_env(
    "dec_pconv", {"TVI_PALLAS_CONV": "1"}, chunk=5))
exp("dec_pconv2")(lambda: bench_decode_env(
    "dec_pconv2", {"TVI_PALLAS_CONV": "2"}, chunk=10, frames=20))
exp("dec_base10")(lambda: bench_decode_env(
    "dec_base10", {}, chunk=10, frames=20))
exp("dec_pconv10")(lambda: bench_decode_env(
    "dec_pconv10", {"TVI_PALLAS_CONV": "1"}, chunk=10, frames=20))
exp("unet_fwd_pconv")(lambda: bench_unet_fwd(
    "unet_fwd_pconv", env={"TVI_PALLAS_CONV": "1"}))


def bench_geglu(name, m=460800, k=320, n=1280, bm=256, bn=512, iters=10):
    """Fused GEGLU projection at the headline FF shape."""
    from tvi.ops.pallas_geglu import geglu_project

    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 2 * n),
                          jnp.bfloat16) * k ** -0.5
    b = jnp.zeros((2 * n,), jnp.bfloat16)

    @jax.jit
    def run(x, w, b):
        def body(i, cur):
            y = geglu_project(cur, w, b, bm=bm, bn0=bn)
            return (cur + 0.001 * (y[:, :k])).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, w, b)
    float(jnp.float32(out[0, 0]))
    t0 = time.perf_counter()
    out = run(x, w, b)
    float(jnp.float32(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * 2 * m * k * n)


exp("geglu_base")(lambda: bench_geglu("geglu_base (bm256 bn512)"))
exp("geglu_bm512")(lambda: bench_geglu("geglu_bm512", bm=512))
exp("geglu_bm1024")(lambda: bench_geglu("geglu_bm1024", bm=1024))
exp("geglu_bm512_bn1280")(lambda: bench_geglu("geglu_bm512_bn1280",
                                              bm=512, bn=1280))


exp("attn_streamed")(lambda: bench_attn_streamed("attn_streamed"))
exp("attn_streamed_bq512")(lambda: bench_attn_streamed("attn_streamed_bq512",
                                                       block_q=512))
exp("attn_bound_bq512")(lambda: bench_attention_qkbound("attn_bound_bq512",
                                                        block_q=512))
exp("mm_bf16_8k")(lambda: bench_matmul("mm_bf16 (8192,8192)x(8192,8192)",
                                       8192, 8192, 8192))
exp("mm_d64")(lambda: bench_matmul("mm_d64 (8192,64)x(64,8192)", 8192, 64, 8192))
exp("mm_d128")(lambda: bench_matmul("mm_d128 (8192,128)x(128,8192)", 8192, 128, 8192))
exp("mm_kbig_n64")(lambda: bench_matmul("mm_kbig_n64 (8192,8192)x(8192,64)",
                                        8192, 8192, 64))

GROUPS = {
    "all_attn": ["attn_base", "attn_exp2", "attn_exp2_bf16", "attn_noexp",
                 "attn_nomax", "attn_qpair", "attn_exp2_bq256"],
    "all_mm": ["mm_d64", "mm_d128", "mm_kbig_n64"],
    "round2b": ["attn_gmax", "attn_gmax_bq256", "dec_base", "dec_chunk25",
                "dec_nogn", "dec_notemporal"],
}


def main():
    names = []
    for arg in sys.argv[1:]:
        names.extend(GROUPS.get(arg, [arg]))
    if not names:
        print("experiments:", " ".join(EXPERIMENTS), "\ngroups:", " ".join(GROUPS))
        return
    print(f"device: {jax.devices()[0]}", flush=True)
    failed = []
    for n in names:
        try:
            EXPERIMENTS[n]()
        except Exception:
            import traceback
            traceback.print_exc()
            failed.append(n)
            print(f"[{n}] FAILED (continuing)", flush=True)
    if failed:
        raise SystemExit(f"failed experiments: {' '.join(failed)}")




# ------------------------- round-3 experiments ------------------------------

def bench_fused_temporal(name, r=18432, f=25, c=320, block_r=0, group=0,
                         iters=10):
    """Fused QKV+frame-attention+out-proj kernel at the headline temporal
    shapes (R=B*H*W rows, F frames, C channels)."""
    from tvi.ops.pallas_fused_temporal import fused_temporal_self_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (r, f, c), jnp.bfloat16)
    scale_w = c ** -0.5
    wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * scale_w
    wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * scale_w
    wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * scale_w
    wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * scale_w
    bo = jnp.zeros((c,), jnp.bfloat16)
    heads = c // 64

    @jax.jit
    def run(x, wq, wk, wv, wo, bo):
        def body(i, cur):
            out = fused_temporal_self_attention(cur, wq, wk, wv, wo, bo,
                                                heads=heads, scale=64 ** -0.5,
                                                block_r=block_r, group=group)
            return (cur + 0.01 * out).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, wq, wk, wv, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(x, wq, wk, wv, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * r * f * c * 4 * c + 4 * r * (c // 64) * f * f * 64
    report(name, dt, flops)


def bench_unfused_temporal(name, r=18432, f=25, c=320, iters=10):
    """The XLA path the fused kernel replaces: LN-less QKV + rows kernel +
    out-proj (same math, unfused HBM traffic)."""
    from tvi.ops.pallas_temporal_attention import temporal_rows_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (r, f, c), jnp.bfloat16)
    scale_w = c ** -0.5
    wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * scale_w
    wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * scale_w
    wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * scale_w
    wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * scale_w
    bo = jnp.zeros((c,), jnp.bfloat16)
    heads = c // 64

    @jax.jit
    def run(x, wq, wk, wv, wo, bo):
        def body(i, cur):
            q = (cur @ wq).reshape(r, f, heads, 64)
            k = (cur @ wk).reshape(r, f, heads, 64)
            v = (cur @ wv).reshape(r, f, heads, 64)
            o = temporal_rows_attention(q, k, v, 64 ** -0.5)
            out = o.reshape(r, f, c) @ wo + bo
            return (cur + 0.01 * out).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, wq, wk, wv, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(x, wq, wk, wv, wo, bo)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * r * f * c * 4 * c + 4 * r * (c // 64) * f * f * 64
    report(name, dt, flops)


def bench_unet_fwd(name, frames=25, height=576, width=1024, iters=3,
                   env=None):
    """Full UNet forward (the denoise step's hot body) with optional env
    knobs (TVI_ATTN_SHIFT / TVI_DISABLE_FUSED_TEMPORAL / TVI_ABLATE ...) —
    set BEFORE tracing, so the knob changes the compiled program."""
    import os as _os
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = _os.environ.get(k)
        _os.environ[k] = v
    try:
        from tvi.core.config import UNetConfig
        from tvi.models.unet_st import UNetSpatioTemporalConditionModel

        cfg = UNetConfig()
        unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16,
                                                param_dtype=jnp.bfloat16)
        params = unet.init_params(jax.random.PRNGKey(0))
        b, f = 2, frames
        h, w = height // 8, width // 8
        x = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 9),
                              jnp.bfloat16)
        ctx = (jnp.zeros((b, 2, cfg.cross_attention_dim), jnp.bfloat16),
               jnp.zeros((b, 1, cfg.cross_attention_dim), jnp.bfloat16))
        ids = jnp.zeros((b, 3), jnp.float32)

        @jax.jit
        def run(params, x):
            def body(i, cur):
                out, _ = unet.apply(params, cur, jnp.zeros((b,)), ctx, ids)
                return (cur + 0.001 * jnp.pad(
                    out, ((0, 0),) * 4 + ((0, 5),))).astype(cur.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        out = run(params, x)
        float(jnp.float32(out[0, 0, 0, 0, 0]))
        t0 = time.perf_counter()
        out = run(params, x)
        float(jnp.float32(out[0, 0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"[{name}] {dt*1e3:8.1f} ms/fwd (env={env})", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v


def bench_decode_env(name, env, **kw):
    import os as _os
    saved = {k: _os.environ.get(k) for k in env}
    for k, v in env.items():
        _os.environ[k] = v
    try:
        bench_decode(name, **kw)
    finally:
        for k, v in saved.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v


exp("dec_tconv_matmul")(lambda: bench_decode("dec_tconv_matmul", chunk=5))
exp("dec_tconv_xla")(lambda: bench_decode_env(
    "dec_tconv_xla", {"TVI_TEMPORAL_CONV": "xla"}, chunk=5))

exp("fused_temporal_320")(lambda: bench_fused_temporal("fused_temporal_320"))
exp("fused_temporal_640")(lambda: bench_fused_temporal(
    "fused_temporal_640", r=4608, c=640))
exp("fused_temporal_1280")(lambda: bench_fused_temporal(
    "fused_temporal_1280", r=1152, c=1280))
for _g in (1, 4, 8, 16):
    exp(f"ft320_g{_g}")(lambda g=_g: bench_fused_temporal(
        f"ft320_g{g}", group=g))
    exp(f"ft640_g{_g}")(lambda g=_g: bench_fused_temporal(
        f"ft640_g{g}", r=4608, c=640, group=g))
exp("ft1280_g8")(lambda: bench_fused_temporal(
    "ft1280_g8", r=1152, c=1280, group=8))
exp("ft1280_g1")(lambda: bench_fused_temporal(
    "ft1280_g1", r=1152, c=1280, group=1))
exp("unfused_temporal_320")(lambda: bench_unfused_temporal("unfused_temporal_320"))
exp("unet_fwd")(lambda: bench_unet_fwd("unet_fwd"))
exp("unet_fwd_rowshift")(lambda: bench_unet_fwd(
    "unet_fwd_rowshift", env={"TVI_ATTN_SHIFT": "row"}))
exp("unet_fwd_nofusedtemporal")(lambda: bench_unet_fwd(
    "unet_fwd_nofusedtemporal", env={"TVI_DISABLE_FUSED_TEMPORAL": "1"}))
exp("unet_fwd_boundnocond")(lambda: bench_unet_fwd(
    "unet_fwd_boundnocond", env={"TVI_ATTN_SHIFT": "bound_unguarded"}))
exp("unet_fwd_fusedspatial")(lambda: bench_unet_fwd(
    "unet_fwd_fusedspatial", env={"TVI_FUSED_SPATIAL": "1"}))
exp("unet_fwd_int8")(lambda: bench_unet_fwd(
    "unet_fwd_int8", env={"TVI_SERVE_INT8": "1"}))
exp("unet_fwd_nogeglu")(lambda: bench_unet_fwd(
    "unet_fwd_nogeglu", env={"TVI_DISABLE_FUSED_GEGLU": "1"}))
exp("unet_fwd_geglu1024")(lambda: bench_unet_fwd(
    "unet_fwd_geglu1024", env={"TVI_GEGLU_BM": "1024"}))

def bench_gn_silu(name, shape=(5, 576, 1024, 128), groups=32, iters=10):
    """Isolated fused GroupNorm+SiLU at the decode up3 tensor shape:
    theoretical floor is 3 HBM passes (2 reads + 1 write) of the bf16
    tensor."""
    from tvi.ops.groupnorm import group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    scale = jnp.ones((shape[-1],), jnp.float32)
    bias = jnp.zeros((shape[-1],), jnp.float32)

    @jax.jit
    def run(x):
        def body(i, cur):
            y = group_norm_silu(cur, scale, bias, groups)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    import numpy as _np
    nbytes = _np.prod(shape) * 2
    print(f"[{name}] {dt*1e3:8.2f} ms/iter  "
          f"{3 * nbytes / dt / 1e9:6.0f} GB/s effective (3-pass model)",
          flush=True)


def bench_attn_chain(name, shift, s=9216, c=320, bf=50, iters=5):
    """In-context spatial self-attention sublayer (LN omitted): QKV proj ->
    dot_product_attention (flash dispatch incl. the (BF,S,H,D)->(BH,S,D)
    transposes) -> out proj, at the exact UNet layer-0 shape."""
    import os as _os
    saved = _os.environ.get("TVI_ATTN_SHIFT")
    _os.environ["TVI_ATTN_SHIFT"] = shift
    try:
        from tvi.ops.attention import dot_product_attention

        heads, d = c // 64, 64
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        x = jax.random.normal(ks[0], (bf, s, c), jnp.bfloat16)
        wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * c ** -0.5
        wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * c ** -0.5
        wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * c ** -0.5
        wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * c ** -0.5

        @jax.jit
        def run(x, wq, wk, wv, wo):
            def body(i, cur):
                q = (cur @ wq).reshape(bf, s, heads, d)
                k = (cur @ wk).reshape(bf, s, heads, d)
                v = (cur @ wv).reshape(bf, s, heads, d)
                o = dot_product_attention(q, k, v).reshape(bf, s, c)
                return (cur + 0.01 * (o @ wo)).astype(cur.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        out = run(x, wq, wk, wv, wo)
        float(jnp.float32(out[0, 0, 0]))
        t0 = time.perf_counter()
        out = run(x, wq, wk, wv, wo)
        float(jnp.float32(out[0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        report(name, dt, 4 * bf * heads * s * s * d + 2 * bf * s * c * c * 4)
    finally:
        if saved is None:
            _os.environ.pop("TVI_ATTN_SHIFT", None)
        else:
            _os.environ["TVI_ATTN_SHIFT"] = saved


def with_env(env, fn, *args, **kw):
    import os as _os
    saved = {k: _os.environ.get(k) for k in env}
    for k, v in env.items():
        _os.environ[k] = v
    try:
        return fn(*args, **kw)
    finally:
        for k, v in saved.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v


exp("attn_chain_boundnocond")(lambda: bench_attn_chain(
    "attn_chain_boundnocond", "bound_unguarded"))


def bench_attn_chain_fused(name, s=9216, c=320, bf=50, iters=5,
                           with_ln=True):
    """The fused LN+QKV+flash+headmajor-outproj sublayer at the same
    layer-0 shape as attn_chain_* (compare directly)."""
    from tvi.ops.pallas_fused_spatial import fused_spatial_self_attention

    heads, d = c // 64, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (bf, s, c), jnp.bfloat16)
    lns = (jnp.ones((c,), jnp.float32) if with_ln else None)
    lnb = (jnp.zeros((c,), jnp.float32) if with_ln else None)
    wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * c ** -0.5
    wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * c ** -0.5
    wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * c ** -0.5
    wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * c ** -0.5

    @jax.jit
    def run(x, wq, wk, wv, wo):
        def body(i, cur):
            o = fused_spatial_self_attention(cur, lns, lnb, wq, wk, wv,
                                             heads=heads, scale=d ** -0.5)
            out = jnp.einsum("bhsd,hdo->bso", o,
                             wo.reshape(heads, d, c),
                             preferred_element_type=jnp.float32)
            return (cur + 0.01 * out.astype(cur.dtype)).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, wq, wk, wv, wo)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(x, wq, wk, wv, wo)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 4 * bf * (c // 64) * s * s * 64 + 2 * bf * s * c * c * 4)


exp("attn_chain_fusedspatial")(lambda: bench_attn_chain_fused(
    "attn_chain_fusedspatial"))
exp("gn_up3")(lambda: bench_gn_silu("gn_up3"))  # XLA default path; see gn_up3_pallas
exp("gn_up3_pallas")(lambda: with_env({"TVI_PALLAS_GN": "1"},
                                      bench_gn_silu, "gn_up3_pallas"))
exp("dec_gn_pallas")(lambda: with_env({"TVI_PALLAS_GN": "1"},
                                      bench_decode, "dec_gn_pallas", chunk=5))
exp("dec_chunk10")(lambda: bench_decode("dec_chunk10", chunk=10, frames=20))
exp("attn_chain_row")(lambda: bench_attn_chain("attn_chain_row", "row"))
exp("attn_chain_bound")(lambda: bench_attn_chain("attn_chain_bound", "bound"))
exp("unet_fwd_nospatialattn")(lambda: bench_unet_fwd(
    "unet_fwd_nospatialattn", env={"TVI_ABLATE": "spatial_attn"}))
exp("unet_fwd_notemporalattn")(lambda: bench_unet_fwd(
    "unet_fwd_notemporalattn", env={"TVI_ABLATE": "temporal_attn"}))
exp("unet_fwd_notransformers")(lambda: bench_unet_fwd(
    "unet_fwd_notransformers", env={"TVI_ABLATE": "transformers"}))
exp("unet_fwd_noff")(lambda: bench_unet_fwd(
    "unet_fwd_noff", env={"TVI_ABLATE": "ff"}))

GROUPS["round3"] = ["fused_temporal_320", "unfused_temporal_320",
                    "fused_temporal_640", "fused_temporal_1280"]


def bench_v5(name, b=50, s=9216, heads=5, c=0, c_in=0, iters=10):
    """v5 whole-sublayer kernel (LN + QKV + flash + out-proj + residual,
    optional in-kernel proj_in) at the model's spatial shapes."""
    from tvi.ops.pallas_attention_v5 import fused_ln_attention_out

    c = c or heads * 64
    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (b, s, c_in or c))
    lns = jnp.ones((c,), jnp.bfloat16)
    lnb = jnp.zeros((c,), jnp.bfloat16)
    wq = mk(1, (c, inner), c ** -0.5)
    wkv = mk(2, (c, 2 * inner), c ** -0.5)
    wo = mk(3, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    w_in = mk(4, (c_in, c), c_in ** -0.5) if c_in else None
    b_in = jnp.zeros((c,), jnp.bfloat16) if c_in else None

    @jax.jit
    def run(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in):
        def body(i, cur):
            out = fused_ln_attention_out(cur, lns, lnb, wq, wkv, wo, bo,
                                         w_in, b_in, heads=heads,
                                         scale=64 ** -0.5)
            if c_in and c_in != c:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, c_in - c)))
            return (0.99 * out).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    flops = (2 * b * s * (c_in or 0) * c + 2 * b * s * c * 3 * inner
             + 2 * 2 * b * s * s * inner + 2 * b * s * inner * c)
    report(name, dt, flops)


exp("v5_320")(lambda: bench_v5("v5_320 (50,9216,c320)"))
exp("v5_640")(lambda: bench_v5("v5_640 (50,2304,c640)", s=2304, heads=10))
exp("v5_1280")(lambda: bench_v5("v5_1280 (50,576,c1280)", s=576, heads=20))
exp("v5p_320")(lambda: bench_v5("v5p_320 (projin 320->320)", c_in=320))
exp("v5p_640")(lambda: bench_v5("v5p_640 (projin 640->640)", s=2304,
                                heads=10, c_in=640))

# round-3 session-4 A/B ladder: v5 / proj_in fold / temporal LN fold /
# packed-QKV attribution (PERF.md session 4)
exp("unet_fwd_nov5")(lambda: bench_unet_fwd(
    "unet_fwd_nov5", env={"TVI_DISABLE_ATTN_V5": "1"}))
exp("unet_fwd_noprojin")(lambda: bench_unet_fwd(
    "unet_fwd_noprojin", env={"TVI_DISABLE_V5_PROJIN": "1"}))
exp("unet_fwd_notemporalln")(lambda: bench_unet_fwd(
    "unet_fwd_notemporalln", env={"TVI_DISABLE_TEMPORAL_LN": "1"}))
exp("unet_fwd_nov5_nopacked")(lambda: bench_unet_fwd(
    "unet_fwd_nov5_nopacked", env={"TVI_DISABLE_ATTN_V5": "1",
                                   "TVI_DISABLE_ATTN_PACKED": "1"}))


def check_v5(name, b=4, s=2304, heads=5, c=320, c_in=0):
    """TPU parity check: the v5 kernel's cross-program scratch persistence
    (KV computed at q-block 0, consumed by later q-blocks of the same
    batch) is an ordering assumption interpret mode cannot validate —
    compare against the XLA reference ON THE CHIP before trusting benches."""
    from tvi.ops.pallas_attention_v5 import (
        fused_ln_attention_out,
        ln_attention_out_reference,
    )

    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (b, s, c_in or c))
    lns = mk(5, (c,), 0.2) + 1.0
    lnb = mk(6, (c,), 0.2)
    wq = mk(1, (c, inner), c ** -0.5)
    wkv = mk(2, (c, 2 * inner), c ** -0.5)
    wo = mk(3, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    w_in = mk(4, (c_in, c), c_in ** -0.5) if c_in else None
    b_in = jnp.zeros((c,), jnp.bfloat16) if c_in else None

    got = fused_ln_attention_out(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in,
                                 heads=heads, scale=64 ** -0.5)
    want = ln_attention_out_reference(x, lns, lnb, wq, wkv, wo, bo, w_in,
                                      b_in, heads=heads, scale=64 ** -0.5)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("v5_check")(lambda: check_v5("v5_check (4,2304,c320)"))
exp("v5_check_projin")(lambda: check_v5("v5_check_projin", c_in=320))
exp("v5_check_576")(lambda: check_v5("v5_check_576 (4,576,c1280)", s=576,
                                     heads=20, c=1280))


def check_temporal_ln(name, r=1024, f=25, c=320, heads=5):
    """TPU parity: LN+residual folded into the fused temporal kernel."""
    from tvi.ops.pallas_fused_temporal import (
        fused_temporal_reference,
        fused_temporal_self_attention,
    )

    inner = c
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (r, f, c))
    lns = mk(1, (c,), 0.2) + 1.0
    lnb = mk(2, (c,), 0.2)
    wq, wk, wv = mk(3, (c, inner), c ** -0.5), mk(4, (c, inner), c ** -0.5), \
        mk(5, (c, inner), c ** -0.5)
    wo = mk(6, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    got = fused_temporal_self_attention(x, wq, wk, wv, wo, bo, heads=heads,
                                        scale=64 ** -0.5, lns=lns, lnb=lnb,
                                        residual=True)
    want = fused_temporal_reference(x, lns, lnb, wq, wk, wv, wo, bo,
                                    heads=heads, scale=64 ** -0.5,
                                    residual=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("temporal_ln_check")(lambda: check_temporal_ln("temporal_ln_check"))


exp("unet_fwd_nocrossff")(lambda: bench_unet_fwd(
    "unet_fwd_nocrossff", env={"TVI_DISABLE_CROSS_FF": "1"}))


def check_cross_ff(name, g=4, rpg=4608, c=320, heads=5, s_ctx=3):
    """TPU parity: norm3+GEGLU FF epilogue folded into the cross kernel."""
    from tvi.ops.pallas_fused_cross import (
        cross_ff_reference,
        fused_cross_attention,
        to_head_major_ctx,
    )

    inner = heads * 64
    f_inner = 4 * c
    m = g * rpg
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x2 = mk(0, (m, c))
    lns = mk(1, (c,), 0.2) + 1.0
    lnb = mk(2, (c,), 0.2)
    wq = mk(3, (c, inner), c ** -0.5)
    ck = to_head_major_ctx(mk(4, (g, s_ctx, inner)), heads)
    cv = to_head_major_ctx(mk(5, (g, s_ctx, inner)), heads)
    wo = mk(6, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    fw1 = mk(7, (c, 2 * f_inner), c ** -0.5)
    fb1 = mk(8, (2 * f_inner,), 0.1)
    fw2 = mk(9, (f_inner, c), f_inner ** -0.5)
    fb2 = jnp.zeros((c,), jnp.bfloat16)
    ffp = (lns, lnb, fw1, fb1, fw2, fb2)
    got = fused_cross_attention(x2, lns, lnb, wq, ck, cv, wo, bo,
                                heads=heads, scale=64 ** -0.5,
                                rows_per_group=rpg, residual=True,
                                ff_params=ffp)
    want = cross_ff_reference(x2, lns, lnb, wq, ck, cv, wo, bo, *ffp,
                              heads=heads, scale=64 ** -0.5,
                              rows_per_group=rpg, residual=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("cross_ff_check")(lambda: check_cross_ff("cross_ff_check"))


exp("unet_fwd_noffin")(lambda: bench_unet_fwd(
    "unet_fwd_noffin", env={"TVI_DISABLE_TEMPORAL_FFIN": "1"}))


def check_temporal_ffin(name, r=1024, f=25, c=320, heads=5):
    """TPU parity: ff_in GEGLU prologue folded into the temporal kernel."""
    from tvi.ops.pallas_fused_temporal import (
        fused_temporal_self_attention,
        temporal_block_reference,
    )

    inner = c
    f_inner = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (r, f, c))
    fls = mk(1, (c,), 0.2) + 1.0
    flb = mk(2, (c,), 0.2)
    fw1 = mk(3, (c, 2 * f_inner), c ** -0.5)
    fb1 = mk(4, (2 * f_inner,), 0.1)
    fw2 = mk(5, (f_inner, c), f_inner ** -0.5)
    fb2 = jnp.zeros((c,), jnp.bfloat16)
    lns = mk(6, (c,), 0.2) + 1.0
    lnb = mk(7, (c,), 0.2)
    wq, wk, wv = (mk(8, (c, inner), c ** -0.5), mk(9, (c, inner), c ** -0.5),
                  mk(10, (c, inner), c ** -0.5))
    wo = mk(11, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    got = fused_temporal_self_attention(
        x, wq, wk, wv, wo, bo, heads=heads, scale=64 ** -0.5,
        lns=lns, lnb=lnb, residual=True,
        ffin_params=(fls, flb, fw1, fb1, fw2, fb2))
    want = temporal_block_reference(x, fls, flb, lns, lnb, wq, wk, wv, wo,
                                    bo, fw1, fb1, fw2, fb2, heads=heads,
                                    scale=64 ** -0.5, residual=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("temporal_ffin_check")(lambda: check_temporal_ffin("temporal_ffin_check"))


exp("unet_fwd_nov5gn")(lambda: bench_unet_fwd(
    "unet_fwd_nov5gn", env={"TVI_DISABLE_V5_GN": "1"}))


def check_v5_gn(name, b=4, s=2304, heads=5, c=320):
    """TPU parity: GN affine + proj_in + LN + attention in one kernel."""
    from tvi.ops.groupnorm import group_norm_affine_params
    from tvi.ops.pallas_attention_v5 import (
        fused_ln_attention_out,
        ln_attention_out_reference,
    )

    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (b, s, c))
    gs = mk(1, (c,), 0.2) + 1.0
    gb = mk(2, (c,), 0.2)
    ga, gab = group_norm_affine_params(x, gs, gb, 32, eps=1e-6)
    ga, gab = ga[:, None, :], gab[:, None, :]
    w_in = mk(3, (c, c), c ** -0.5)
    b_in = mk(4, (c,), 0.1)
    lns = mk(5, (c,), 0.2) + 1.0
    lnb = mk(6, (c,), 0.2)
    wq = mk(7, (c, inner), c ** -0.5)
    wkv = mk(8, (c, 2 * inner), c ** -0.5)
    wo = jnp.eye(inner, c, dtype=jnp.bfloat16) * 0.1
    bo = jnp.zeros((c,), jnp.bfloat16)
    got = fused_ln_attention_out(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in,
                                 ga, gab, heads=heads, scale=64 ** -0.5)
    want = ln_attention_out_reference(x, lns, lnb, wq, wkv, wo, bo, w_in,
                                      b_in, ga, gab, heads=heads,
                                      scale=64 ** -0.5)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("v5_check_gn")(lambda: check_v5_gn("v5_check_gn"))


exp("unet_fwd_xlapad")(lambda: bench_unet_fwd(
    "unet_fwd_xlapad", env={"TVI_TEMPORAL_INKERNEL_PAD": "0"}))


exp("unet_fwd_4d")(lambda: bench_unet_fwd(
    "unet_fwd_4d", env={"TVI_TEMPORAL_4D": "1"}))


# input-side 4D kernel alone (blend/proj_out stay on the functional tail):
# isolates the two transposed-IO kernels in the A/B ladder
exp("unet_fwd_4d_in")(lambda: bench_unet_fwd(
    "unet_fwd_4d_in", env={"TVI_TEMPORAL_4D": "1",
                           "TVI_TEMPORAL_OUT4D": "0"}))


def check_temporal_4d(name, b=2, f=25, s=512, c=320, heads=5):
    """TPU parity: untransposed 4D input + in-kernel emb-add/relayout."""
    from tvi.ops.pallas_fused_temporal import (
        fused_temporal_self_attention_4d,
        temporal_block_4d_reference,
    )

    inner = c
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x4 = mk(0, (b, f, s, c))
    emb4 = mk(1, (b, f, 1, c), 0.3)
    lns = mk(2, (c,), 0.2) + 1.0
    lnb = mk(3, (c,), 0.2)
    wq, wk, wv = (mk(4, (c, inner), c ** -0.5), mk(5, (c, inner), c ** -0.5),
                  mk(6, (c, inner), c ** -0.5))
    wo = mk(7, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    got = fused_temporal_self_attention_4d(
        x4, emb4, wq, wk, wv, wo, bo, heads=heads, scale=64 ** -0.5,
        lns=lns, lnb=lnb, residual=True)
    want = temporal_block_4d_reference(
        x4, emb4, None, None, lns, lnb, wq, wk, wv, wo, bo,
        heads=heads, scale=64 ** -0.5, residual=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("temporal_4d_check")(lambda: check_temporal_4d("temporal_4d_check"))


def check_out4d(name, b=2, f=25, s=512, c=320, heads=5, s_ctx=2):
    """TPU parity: the out4d cross kernel (attn2+FF+blend+proj_out+res)."""
    from tvi.ops.pallas_fused_cross import (
        cross_ff_out4d_reference,
        fused_cross_ff_out4d,
        to_head_major_ctx,
    )

    inner = heads * 64
    f_inner = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 14)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x2 = mk(0, (b * s * f, c))
    lns = mk(1, (c,), 0.2) + 1.0
    lnb = jnp.zeros((c,), jnp.bfloat16)
    wq = mk(2, (c, inner), c ** -0.5)
    ck = to_head_major_ctx(mk(3, (b, s_ctx, inner)), heads)
    cv = to_head_major_ctx(mk(4, (b, s_ctx, inner)), heads)
    wo = mk(5, (inner, c), inner ** -0.5)
    bo = jnp.zeros((c,), jnp.bfloat16)
    ffp = (mk(6, (c,), 0.2) + 1.0, jnp.zeros((c,), jnp.bfloat16),
           mk(7, (c, 2 * f_inner), c ** -0.5), mk(8, (2 * f_inner,), 0.1),
           mk(9, (f_inner, c), f_inner ** -0.5),
           jnp.zeros((c,), jnp.bfloat16))
    wpo = mk(10, (c, c), c ** -0.5)
    bpo = mk(11, (c,), 0.1)
    alpha = jax.nn.sigmoid(jnp.full((1,), 0.5, jnp.bfloat16))
    spatial4 = mk(12, (b, f, s, c))
    res4 = mk(13, (b, f, s, c))
    got = fused_cross_ff_out4d(x2, lns, lnb, wq, ck, cv, wo, bo, ffp,
                               wpo, bpo, alpha, spatial4, res4,
                               heads=heads, scale=64 ** -0.5)
    want = cross_ff_out4d_reference(x2, lns, lnb, wq, ck, cv, wo, bo, *ffp,
                                    wpo, bpo, alpha, spatial4, res4,
                                    heads=heads, scale=64 ** -0.5,
                                    rows_per_group=s * f)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"[{name}] max|err|={err:.5f} max|ref|={ref:.3f} "
          f"{'OK' if err < 0.05 * max(ref, 1.0) else 'MISMATCH'}", flush=True)


exp("out4d_check")(lambda: check_out4d("out4d_check"))


def check_qkv_ln(name, b=2, s=2304, c=320, heads=5):
    """TPU parity: LN + fused-QKV + split + k-norm streaming kernel
    (tvi/ops/pallas_attention_out.py::ln_qkv_split) vs its XLA reference."""
    from tvi.ops.pallas_attention_out import _ln_qkv_split_fwd, ln_qkv_reference

    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (b, s, c))
    lns = (mk(1, (c,), 0.2) + 1.0).astype(jnp.float32)
    lnb = mk(2, (c,), 0.2).astype(jnp.float32)
    wq = mk(3, (c, inner), c ** -0.5)
    wk = mk(4, (c, inner), c ** -0.5)
    wv = mk(5, (c, inner), c ** -0.5)
    got = _ln_qkv_split_fwd(x, lns, lnb, wq, wk, wv, heads=heads)
    want = ln_qkv_reference(x, lns, lnb, wq, wk, wv, heads=heads)
    worst = 0.0
    for g, w in zip(got, want):
        err = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                    - w.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(w.astype(jnp.float32))))
        worst = max(worst, err / max(ref, 1e-6))
    print(f"[{name}] worst rel err {worst:.5f} "
          f"{'OK' if worst < 0.05 else 'MISMATCH'}", flush=True)


exp("qkv_ln_check")(lambda: check_qkv_ln("qkv_ln_check"))


def bench_qkv_ln(name, b=50, s=9216, c=320, heads=5, iters=10, fused=True):
    """The level-0 attention feed chain: norm1 + fused-QKV projection +
    split + k-norm — as the streaming kernel (fused=True) vs the XLA chain
    it replaces.  Timed via a dependency-carrying loop."""
    from tvi.ops.pallas_attention_out import _ln_qkv_split_fwd, ln_qkv_reference

    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape, jnp.bfloat16) * sc)
    x = mk(0, (b, s, c))
    lns = (mk(1, (c,), 0.2) + 1.0).astype(jnp.float32)
    lnb = mk(2, (c,), 0.2).astype(jnp.float32)
    wq = mk(3, (c, inner), c ** -0.5)
    wk = mk(4, (c, inner), c ** -0.5)
    wv = mk(5, (c, inner), c ** -0.5)
    fn = _ln_qkv_split_fwd if fused else ln_qkv_reference

    @jax.jit
    def run(x, lns, lnb, wq, wk, wv):
        def body(i, cur):
            q, k, v, kn = fn(cur, lns, lnb, wq, wk, wv, heads=heads)
            return (cur + 0.0001 * (q + k + v) * kn[:, :, :1]).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, lns, lnb, wq, wk, wv)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(x, lns, lnb, wq, wk, wv)
    float(jnp.float32(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * 3 * b * s * c * inner)


exp("qkv_ln_320")(lambda: bench_qkv_ln("qkv_ln_320 (50,9216,c320)"))
exp("qkv_ln_320_xla")(lambda: bench_qkv_ln("qkv_ln_320_xla (XLA chain)",
                                           fused=False))
exp("unet_fwd_noqkvln")(lambda: bench_unet_fwd(
    "unet_fwd_noqkvln", env={"TVI_DISABLE_QKV_LN": "1"}))


def check_qkv_projin(name, b=2, s=2304, c=320, heads=5):
    """TPU parity: GN-affine + proj_in + LN + QKV streaming kernel
    (tvi/ops/pallas_attention_out.py::ln_qkv_projin) vs its XLA reference."""
    from tvi.ops.pallas_attention_out import (
        _ln_qkv_projin_fwd,
        ln_qkv_projin_reference,
    )

    inner = heads * 64
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    mk = lambda i, shape, sc=1.0: (jax.random.normal(ks[i], shape,
                                                     jnp.bfloat16) * sc)
    x = mk(0, (b, s, c))
    ga = (1.0 + 0.1 * jax.random.normal(ks[1], (b, 1, c))).astype(jnp.float32)
    gb = (0.1 * jax.random.normal(ks[2], (b, 1, c))).astype(jnp.float32)
    win = mk(3, (c, c), c ** -0.5)
    bin_ = mk(4, (c,), 0.1)
    lns = (mk(5, (c,), 0.2) + 1.0).astype(jnp.float32)
    lnb = mk(6, (c,), 0.2).astype(jnp.float32)
    wq = mk(7, (c, inner), c ** -0.5)
    wk = mk(8, (c, inner), c ** -0.5)
    wv = mk(9, (c, inner), c ** -0.5)
    got = _ln_qkv_projin_fwd(x, ga, gb, win, bin_, lns, lnb, wq, wk, wv,
                             heads=heads)
    want = ln_qkv_projin_reference(x, ga, gb, win, bin_, lns, lnb,
                                   wq, wk, wv, heads=heads)
    worst = 0.0
    for g, w in zip(got, want):
        err = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                    - w.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(w.astype(jnp.float32))))
        worst = max(worst, err / max(ref, 1e-6))
    print(f"[{name}] worst rel err {worst:.5f} "
          f"{'OK' if worst < 0.05 else 'MISMATCH'}", flush=True)


exp("qkv_projin_check")(lambda: check_qkv_projin("qkv_projin_check"))
exp("qkv_projin_check_1280")(lambda: check_qkv_projin(
    "qkv_projin_check_1280", b=2, s=576, c=1280, heads=20))
exp("unet_fwd_qkvprojin")(lambda: bench_unet_fwd(
    "unet_fwd_qkvprojin"))  # default-on since r4s7; A/B vs _noqkvprojin
exp("unet_fwd_noqkvprojin")(lambda: bench_unet_fwd(
    "unet_fwd_noqkvprojin", env={"TVI_DISABLE_QKV_PROJIN": "1"}))


# ---------------------- round-5 prototype: Winograd conv --------------------
# F(2x2, 3x3) Winograd: 2.25x fewer MACs than direct 3x3 (16 vs 36 per
# output tile).  The ONLY untried FLOP-level lever on the conv bucket
# (PERF.md round-5 queue #2).  This is the isolated prototype mandated by
# the in-context-inversion law: prove the transform overhead is paid for
# at the bucket's shapes BEFORE any model wiring.
#
# XLA formulation: the 16 per-position products are (P, Cin) @ (Cin, Cout)
# matmuls (P = N*H/2*W/2 tiles) riding the MXU; the input/output
# transforms are pure add/sub combinations of strided slices (VPU).  Known
# risk (arithmetic, PERF.md): the transformed-tile tensor is 4x the input
# bytes — if XLA materializes it in HBM the kernel is traffic-bound at
# ~0.5 TB/s and loses to direct conv; a win requires the transforms to
# fuse into the batched-matmul's prologue/epilogue or a Pallas mega-kernel.

_WG_G = np.array([[1.0, 0.0, 0.0],
                  [0.5, 0.5, 0.5],
                  [0.5, -0.5, 0.5],
                  [0.0, 0.0, 1.0]], dtype=np.float32)


def _wg_weight_transform(w):
    """(3,3,Cin,Cout) -> (4,4,Cin,Cout): G @ g @ G^T (fp32, tiny)."""
    g32 = w.astype(jnp.float32)
    return jnp.einsum("ai,bj,ijcd->abcd", _WG_G, _WG_G, g32)


def winograd_conv3x3_xla(x, w4, b, *, mm_dtype=jnp.bfloat16, stack=True):
    """F(2x2,3x3) same-padding conv, XLA-level.

    x: (N,H,W,Cin) with H,W even; w4: pre-transformed (4,4,Cin,Cout);
    b: (Cout,).  Transforms in the input dtype (coeffs are 0/±1 adds);
    products accumulate fp32 on the MXU.
    """
    n, h, wd, cin = x.shape
    cout = w4.shape[-1]
    ht, wt = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[i][j]: (N, Ht, Wt, Cin) strided tile slices (rows 2ty+i, cols 2tx+j)
    d = [[xp[:, i:i + h:2, j:j + wd:2, :] for j in range(4)]
         for i in range(4)]
    # B^T d (rows):  t0=d0-d2  t1=d1+d2  t2=d2-d1  t3=d1-d3
    t = [[d[0][j] - d[2][j] for j in range(4)],
         [d[1][j] + d[2][j] for j in range(4)],
         [d[2][j] - d[1][j] for j in range(4)],
         [d[1][j] - d[3][j] for j in range(4)]]
    # (B^T d) B (cols): same combination over j
    u = [[t[a][0] - t[a][2], t[a][1] + t[a][2],
          t[a][2] - t[a][1], t[a][1] - t[a][3]] for a in range(4)]
    w4c = w4.astype(mm_dtype)
    if stack:
        up = jnp.stack([u[a][bb].reshape(n * ht * wt, cin)
                        for a in range(4) for bb in range(4)])
        m_flat = jnp.einsum("tpc,tcd->tpd", up.astype(mm_dtype),
                            w4c.reshape(16, cin, cout),
                            preferred_element_type=jnp.float32)
        m = [[m_flat[4 * a + bb].reshape(n, ht, wt, cout) for bb in range(4)]
             for a in range(4)]
    else:
        m = [[jnp.einsum("nywc,cd->nywd", u[a][bb].astype(mm_dtype),
                         w4c[a, bb], preferred_element_type=jnp.float32)
              for bb in range(4)] for a in range(4)]
    # A^T m (rows): s0=m0+m1+m2  s1=m1-m2-m3
    s = [[m[0][bb] + m[1][bb] + m[2][bb] for bb in range(4)],
         [m[1][bb] - m[2][bb] - m[3][bb] for bb in range(4)]]
    # (A^T m) A (cols)
    y = [[s[uu][0] + s[uu][1] + s[uu][2],
          s[uu][1] - s[uu][2] - s[uu][3]] for uu in range(2)]
    out = jnp.stack([y[0][0], y[0][1], y[1][0], y[1][1]], axis=3)
    out = out.reshape(n, ht, wt, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(n, h, wd, cout) + b.astype(jnp.float32)
    return out.astype(x.dtype)


def check_winograd(name, n=2, h=32, wd=64, cin=16, cout=24):
    """Correctness vs lax direct conv (fp32, CPU-runnable)."""
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (n, h, wd, cin), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    for stack in (True, False):
        got = winograd_conv3x3_xla(x, _wg_weight_transform(w), b,
                                   mm_dtype=jnp.float32, stack=stack)
        err = float(jnp.max(jnp.abs(got - want)))
        ref = float(jnp.max(jnp.abs(want)))
        print(f"[{name}] stack={stack} max rel err {err / ref:.2e} "
              f"{'OK' if err / ref < 1e-5 else 'MISMATCH'}", flush=True)


def bench_winograd(name, n=5, h=576, wd=1024, cin=128, cout=128, iters=10,
                   stack=True, mm_dtype=jnp.bfloat16):
    """Report EFFECTIVE TF/s against the direct-conv FLOP count (so the
    number is directly comparable to conv_up3 etc.; actual MACs are /2.25)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, wd, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.05
    b = jnp.zeros((cout,), jnp.float32)

    @jax.jit
    def run(x, w, b):
        w4 = _wg_weight_transform(w)
        def body(i, cur):
            y = winograd_conv3x3_xla(cur, w4, b, mm_dtype=mm_dtype,
                                     stack=stack)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * wd * cin * cout * 9)


def bench_winograd_row(name, n=5, h=576, wd=1024, cin=128, cout=128,
                       iters=10, block_rows=0, silu=False):
    """Pallas row-Winograd F(2,3) kernel (tvi/ops/pallas_winograd.py):
    1.5x MAC cut over direct, same structure as pconv3 k3.  Effective TF/s
    vs the direct 9-tap FLOP count, comparable to conv_*/pconv3_*."""
    from tvi.ops.pallas_winograd import conv3x3_winograd_row

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, wd, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.05
    b = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def run(x, w, b):
        def body(i, cur):
            y = conv3x3_winograd_row(cur, w, b, apply_silu=silu,
                                     block_rows=block_rows)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * wd * cin * cout * 9)


def bench_winograd_row_gn(name, n=5, h=576, wd=1024, cin=128, cout=128,
                          iters=10, block_rows=0):
    """GN+SiLU prologue fused into the row-Winograd kernel — A/B vs
    pconv3_*_gn (the v3 fused chain) at the resnet/decoder chain shapes."""
    from tvi.ops.pallas_winograd import group_norm_silu_winograd_row

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, wd, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.05
    b = jnp.zeros((cout,), jnp.bfloat16)
    gamma = jnp.ones((cin,), jnp.float32)
    beta = jnp.zeros((cin,), jnp.float32)

    @jax.jit
    def run(x, w, b):
        def body(i, cur):
            y = group_norm_silu_winograd_row(cur, gamma, beta, 32, w, b,
                                             block_rows=block_rows)
            return (cur + 0.001 * y).astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    t0 = time.perf_counter()
    out = run(x, w, b)
    float(jnp.float32(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, 2 * n * h * wd * cin * cout * 9)


exp("wg_row_up3_gn")(lambda: bench_winograd_row_gn("wg_row_up3_gn"))


def check_winograd_row_tpu(name, n=2, h=32, wd=256, cin=128, cout=128):
    """Mosaic-path parity gate (REAL compiled kernel, not interpret)."""
    from tvi.ops.pallas_winograd import conv3x3_winograd_row

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, wd, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.bfloat16)
    want = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(jnp.float32)
    got = conv3x3_winograd_row(x, w, b).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - want)))
    ref = float(jnp.max(jnp.abs(want)))
    print(f"[{name}] max rel err {err / ref:.2e} "
          f"{'OK' if err / ref < 0.05 else 'MISMATCH'}", flush=True)


exp("wg_row_check")(lambda: check_winograd_row_tpu("wg_row_check"))
exp("wg_row_up3")(lambda: bench_winograd_row("wg_row_up3 (5,576,1024,128)"))
exp("wg_row_up3_bh32")(lambda: bench_winograd_row("wg_row_up3_bh32",
                                                  block_rows=32))
exp("wg_row_up2")(lambda: bench_winograd_row("wg_row_up2 (5,288,512,256)",
                                             h=288, wd=512, cin=256,
                                             cout=256))
exp("wg_row_unet320")(lambda: bench_winograd_row(
    "wg_row_unet320 (50,72,128,320)", n=50, h=72, wd=128, cin=320, cout=320))
exp("winograd_check")(lambda: check_winograd("winograd_check"))
exp("wg_up3")(lambda: bench_winograd("wg_up3 (5,576,1024,128)"))
exp("wg_up3_loop")(lambda: bench_winograd("wg_up3_loop", stack=False))
exp("wg_up2")(lambda: bench_winograd("wg_up2 (5,288,512,256)", h=288, wd=512,
                                     cin=256, cout=256))
exp("wg_unet320")(lambda: bench_winograd("wg_unet320 (50,72,128,320)", n=50,
                                         h=72, wd=128, cin=320, cout=320))
GROUPS["winograd"] = ["winograd_check", "wg_up3", "wg_up3_loop", "wg_up2",
                      "wg_unet320", "conv_up3", "conv_up2", "conv_unet320"]
GROUPS["winograd_row"] = ["wg_row_check", "wg_row_up3", "wg_row_up3_bh32",
                          "wg_row_up2", "wg_row_unet320",
                          "pconv3_up3_k3", "pconv3_up2_k3", "conv_up3",
                          "conv_up2", "conv_unet320"]

if __name__ == "__main__":
    main()
