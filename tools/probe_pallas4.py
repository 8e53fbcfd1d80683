"""Probe 4: extraction row-gather, VMEM limits, realistic refill decode loop,
banked vreg gathers for resolve, transpose and cumsum costs.
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOPS = 256


def bench(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe(name, build, per_iter=True):
    try:
        fn, args = build()
        dt, _ = bench(fn, *args)
        if per_iter:
            print(f"{name:56s} {dt/LOOPS*1e9:9.1f} ns/iter")
        else:
            print(f"{name:56s} {dt*1e6:9.1f} us total")
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{name:56s} FAILED: {type(e).__name__}: {msg}")
    sys.stdout.flush()


def mk_rowgather_xla(L, NB, K):
    """XLA: take L*K rows of 128 words from (NB,128) blocks."""
    @jax.jit
    def fn(blocks, idx):
        return jnp.take(blocks, idx, axis=0)
    blocks = jnp.ones((NB, 128), jnp.uint32)
    idx = (jnp.arange(L * K, dtype=jnp.int32) * 7) % NB
    return fn, (blocks, idx)


def mk_rowgather_ds(L, NB):
    """XLA: vmap dynamic_slice of 3x128-word rows."""
    blocks = jnp.ones((NB * 128,), jnp.uint32)

    @jax.jit
    def fn(blocks, starts):
        def one(s):
            return jax.lax.dynamic_slice(blocks, (s,), (384,))
        return jax.vmap(one)(starts)
    starts = ((jnp.arange(L, dtype=jnp.int32) * 997) % (NB - 4)) * 128
    return fn, (blocks, starts)


def mk_refill_decode(L, SW):
    """decode loop with REAL private-row refill: stateless 64-bit window
    rebuilt from 3 words of the lane's own stream row via one onehot +
    rolls, plus litlen onehot-MXU lookup + dist lookup."""
    TS = 512

    def kernel(s_ref, lt_ref, o_ref):
        rows = s_ref[:]          # (L, SW) u32 per-lane stream
        rows1 = pltpu.roll(rows, -1, 1)
        rows2 = pltpu.roll(rows, -2, 1)
        ltab = lt_ref[:]
        iota_sw = jax.lax.broadcasted_iota(jnp.int32, (L, SW), 1)
        iota_ts = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 1)

        def body(t, carry):
            bitpos, acc = carry
            p = bitpos >> 5
            oh = iota_sw == p
            w0 = jnp.sum(jnp.where(oh, rows, 0), axis=1, keepdims=True)
            w1 = jnp.sum(jnp.where(oh, rows1, 0), axis=1, keepdims=True)
            w2 = jnp.sum(jnp.where(oh, rows2, 0), axis=1, keepdims=True)
            s = (bitpos & 31).astype(jnp.uint32)
            lo = jnp.where(s == 0, w0, (w0 >> s) | (w1 << (32 - s)))
            hi = jnp.where(s == 0, w1, (w1 >> s) | (w2 << (32 - s)))
            idx = (lo & (TS - 1)).astype(jnp.int32)
            ohe = (iota_ts == idx).astype(jnp.float32)
            e = jnp.dot(ohe, ltab, preferred_element_type=jnp.float32)
            ln = e[:, :1].astype(jnp.int32)
            eb = e[:, 1:2].astype(jnp.int32)
            val = e[:, 2:3].astype(jnp.int32)
            k = (ln + eb).astype(jnp.uint32)
            w = (lo >> k) | (hi << (32 - k))
            di = (w & 63).astype(jnp.int32)
            # dist via second onehot (64-entry table folded in ltab cols 3..)
            ohd = (iota_ts == (di + 64)).astype(jnp.float32)
            de = jnp.dot(ohd, ltab, preferred_element_type=jnp.float32)
            dk = de[:, :1].astype(jnp.int32)
            adv = (ln + eb + dk).astype(jnp.int32)
            return (bitpos + jnp.minimum(adv, 30), acc + val)
        bitpos = jnp.zeros((L, 1), jnp.int32)
        acc = jnp.zeros((L, 1), jnp.int32)
        _, acc = jax.lax.fori_loop(0, LOOPS, body, (bitpos, acc))
        o_ref[:] = acc

    @jax.jit
    def fn(s, lt):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, lt)

    s = jnp.ones((L, SW), jnp.uint32) * 0x9E3779B9
    lt = jnp.concatenate([
        (jnp.arange(TS, dtype=jnp.float32)[:, None] % 9) + 1,
        jnp.arange(TS, dtype=jnp.float32)[:, None] % 5,
        jnp.arange(TS, dtype=jnp.float32)[:, None] % 256,
    ], axis=1)
    return fn, (s, lt)


def mk_banked_gather(R, NB):
    """resolve-style banked gather: out rows (R,128) gathered from own
    (R, NB*128) history via NB gathers+selects."""
    def kernel(h_ref, i_ref, o_ref):
        idx = i_ref[:]

        def body(t, acc):
            lo = (idx + acc) & 127
            hi = ((idx + acc) >> 7) & (NB - 1)
            out = jnp.zeros_like(idx)
            for b in range(NB):
                g = jnp.take_along_axis(h_ref[:, b * 128:(b + 1) * 128],
                                        lo, axis=1)
                out = jnp.where(hi == b, g, out)
            return (acc + out) & (NB * 128 - 1)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, jnp.zeros_like(idx))

    @jax.jit
    def fn(h, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(h, i)
    h = (jnp.arange(R * NB * 128, dtype=jnp.int32).reshape(R, NB * 128) * 7) & (NB * 128 - 1)
    i = (jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128) * 3) & (NB * 128 - 1)
    return fn, (h, i)


def mk_transpose(T, L):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, T), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    x = jnp.ones((T, L), jnp.int32)
    return fn, (x,)


def mk_cumsum(T, L):
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    x = jnp.ones((T, L), jnp.int32)
    return fn, (x,)


def mk_vmem_alloc(mb):
    n = mb * 1024 * 1024 // 4

    def kernel(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:][:8, :128])

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(x)
    x = jnp.ones((n // 128, 128), jnp.int32)
    return fn, (x,)


if __name__ == "__main__":
    print("dev:", jax.devices())
    probe("xla row-gather L*3=6144 rows of 128w", lambda: mk_rowgather_xla(2048, 4096, 3), per_iter=False)
    probe("xla vmap dynamic_slice 2048x384w", lambda: mk_rowgather_ds(2048, 4096), per_iter=False)
    probe("refill-decode L=1024 SW=384", lambda: mk_refill_decode(1024, 384))
    probe("refill-decode L=2048 SW=384", lambda: mk_refill_decode(2048, 384))
    probe("banked-gather R=256 NB=8 (1KiB rows)", lambda: mk_banked_gather(256, 8))
    probe("banked-gather R=256 NB=32 (4KiB rows)", lambda: mk_banked_gather(256, 32))
    probe("banked-gather R=512 NB=32", lambda: mk_banked_gather(512, 32))
    probe("transpose (1024,2048) i32", lambda: mk_transpose(1024, 2048), per_iter=False)
    probe("cumsum axis1 (2048,1024) i32", lambda: mk_cumsum(2048, 1024), per_iter=False)
    probe("vmem alloc 8MB", lambda: mk_vmem_alloc(8), per_iter=False)
    probe("vmem alloc 16MB", lambda: mk_vmem_alloc(16), per_iter=False)
    probe("vmem alloc 32MB", lambda: mk_vmem_alloc(32), per_iter=False)
    probe("vmem alloc 64MB", lambda: mk_vmem_alloc(64), per_iter=False)
