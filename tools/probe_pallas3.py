"""Probe 3: clean cost model for the inflate-kernel toolkit.

All index math uses & masks (no integer mod — Mosaic emits real division).
Measures, per 1024 lanes:
  1. vreg dynamic_gather shapes/cost
  2. MXU onehot shared-table lookup (masked, multiple payload columns)
  3. onehot-reduce private-row gather
  4. uniform dynamic row load (lock-step word refill)
  5. full mock decode iteration combining them
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOPS = 256


def bench(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe(name, build):
    try:
        fn, args = build()
        dt, _ = bench(fn, *args)
        print(f"{name:56s} {dt/LOOPS*1e9:9.1f} ns/iter")
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{name:56s} FAILED: {type(e).__name__}: {msg}")
    sys.stdout.flush()


def pc(kernel, out_sd, *arrs):
    @jax.jit
    def fn(*a):
        return pl.pallas_call(
            kernel,
            out_shape=out_sd,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    return fn


def mk_fma(R):
    def kernel(x_ref, o_ref):
        def body(i, x):
            return x * 1.0001 + 0.5
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])
    x = jnp.ones((R, 128), jnp.float32)
    return pc(kernel, jax.ShapeDtypeStruct((R, 128), jnp.float32)), (x,)


def mk_vg(R, W):
    """vreg dynamic_gather (R,W) axis=1, dependent, masked."""
    def kernel(t_ref, i_ref, o_ref):
        tab = t_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tab, idx, axis=1)
            return (v + 1) & (W - 1)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, i_ref[:])
    tab = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W) * 7) & (W - 1)
    idx = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W) * 3) & (W - 1)
    return pc(kernel, jax.ShapeDtypeStruct((R, W), jnp.int32), tab, idx), (tab, idx)


def mk_onehot(L, TS, CO):
    """MXU onehot lookup: (L,TS) onehot @ (TS,CO), dependent."""
    def kernel(t_ref, i_ref, o_ref):
        tab = t_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 1)

        def body(i, idx):
            oh = (iota == idx).astype(jnp.float32)
            v = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            return (idx + v[:, :1].astype(jnp.int32) + 1) & (TS - 1)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, i_ref[:])
    tab = (jnp.arange(TS * CO, dtype=jnp.float32).reshape(TS, CO)) % 64
    idx = (jnp.arange(L, dtype=jnp.int32)[:, None] * 3) & (TS - 1)
    return pc(kernel, jax.ShapeDtypeStruct((L, 1), jnp.int32), tab, idx), (tab, idx)


def mk_private_onehot(L, W):
    """private-row gather via onehot+rowsum: out[l] = row[l, idx[l]]."""
    def kernel(s_ref, i_ref, o_ref):
        rows = s_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)

        def body(i, idx):
            oh = (iota == idx)
            v = jnp.sum(jnp.where(oh, rows, 0), axis=1, keepdims=True)
            return (v + 1) & (W - 1)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, i_ref[:])
    rows = (jnp.arange(L * W, dtype=jnp.int32).reshape(L, W) * 7) & (W - 1)
    idx = (jnp.arange(L, dtype=jnp.int32)[:, None] * 3) & (W - 1)
    return pc(kernel, jax.ShapeDtypeStruct((L, 1), jnp.int32), rows, idx), (rows, idx)


def mk_rowload(W, L):
    """uniform dynamic row load: stream (W, L), scalar row index."""
    def kernel(s_ref, o_ref):
        def body(i, acc):
            t = acc[0, 0] & (W - 1)
            row = s_ref[pl.ds(t, 1), :]
            return acc + row
        o_ref[:] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((1, L), jnp.int32))
    s = jnp.ones((W, L), jnp.int32)
    return pc(kernel, jax.ShapeDtypeStruct((1, L), jnp.int32), s), (s,)


def mk_decode_iter(L, TS):
    """realistic decode iteration: 64-bit buffer shift/refill (uniform row)
    + onehot litlen lookup (TS entries, payload: len|kind|val|extra)
    + extra-bits arithmetic + onehot dist lookup (64 entries)."""
    W = 512

    def kernel(s_ref, lt_ref, dt_ref, o_ref):
        ltab, dtab = lt_ref[:], dt_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 1)
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (L, 64), 1)

        def body(t, carry):
            lo, hi, nb, acc = carry
            # litlen lookup from lo window
            idx = lo & (TS - 1)
            oh = (iota == idx).astype(jnp.float32)
            e = jnp.dot(oh, ltab, preferred_element_type=jnp.float32)
            ln = e[:, :1].astype(jnp.int32)   # code length 1..15
            eb = e[:, 1:2].astype(jnp.int32)  # extra bits
            val = e[:, 2:3].astype(jnp.int32)
            k = (ln + eb) & 31
            extra = (lo >> ln.astype(jnp.uint32)) & ((1 << eb) - 1)
            # dist lookup
            lo2 = (lo >> k) | (hi << (32 - k))
            hi2 = hi >> k
            di = lo2 & 63
            ohd = (iota64 == di).astype(jnp.float32)
            de = jnp.dot(ohd, dtab, preferred_element_type=jnp.float32)
            dk = de[:, :1].astype(jnp.int32) & 31
            lo3 = (lo2 >> dk) | (hi2 << (32 - dk))
            hi3 = hi2 >> dk
            nb2 = nb - k - dk
            # refill one word when nb2 < 32 (uniform row load, per-lane select)
            row = s_ref[pl.ds(t & (W - 1), 1), :].reshape(L, 1)
            need = nb2 < 32
            hi4 = jnp.where(need, hi3 | (row << (nb2 & 31)), hi3)
            nb3 = jnp.where(need, nb2 + 32, nb2)
            return (lo3, hi4, nb3, acc + val + extra)
        lo = jnp.ones((L, 1), jnp.int32) * 3
        hi = jnp.ones((L, 1), jnp.int32) * 5
        nb = jnp.full((L, 1), 64, jnp.int32)
        acc = jnp.zeros((L, 1), jnp.int32)
        _, _, _, acc = jax.lax.fori_loop(0, LOOPS, body, (lo, hi, nb, acc))
        o_ref[:] = acc
    s = jnp.ones((W, L), jnp.int32)
    ltab = jnp.concatenate([
        (jnp.arange(TS, dtype=jnp.float32)[:, None] % 14) + 1,
        (jnp.arange(TS, dtype=jnp.float32)[:, None] % 5),
        jnp.arange(TS, dtype=jnp.float32)[:, None] % 256,
    ], axis=1)
    dtab = ((jnp.arange(64, dtype=jnp.float32)[:, None] % 13) + 1
            ) * jnp.ones((1, 3), jnp.float32)
    return pc(kernel, jax.ShapeDtypeStruct((L, 1), jnp.int32), s, ltab, dtab), (s, ltab, dtab)


if __name__ == "__main__":
    print("dev:", jax.devices())
    probe("fma (8,128) [loop overhead ref]", lambda: mk_fma(8))
    probe("fma (1024,128)", lambda: mk_fma(1024))
    probe("vreg-gather (8,128)", lambda: mk_vg(8, 128))
    probe("vreg-gather (16,128)", lambda: mk_vg(16, 128))
    probe("vreg-gather (64,128)", lambda: mk_vg(64, 128))
    probe("vreg-gather (512,128)", lambda: mk_vg(512, 128))
    probe("onehot-mxu L=1024 TS=512 CO=8", lambda: mk_onehot(1024, 512, 8))
    probe("onehot-mxu L=1024 TS=2048 CO=8", lambda: mk_onehot(1024, 2048, 8))
    probe("onehot-mxu L=2048 TS=512 CO=8", lambda: mk_onehot(2048, 512, 8))
    probe("private-onehot L=1024 W=512", lambda: mk_private_onehot(1024, 512))
    probe("private-onehot L=1024 W=128", lambda: mk_private_onehot(1024, 128))
    probe("rowload W=512 L=1024", lambda: mk_rowload(512, 1024))
    probe("decode-iter L=1024 TS=512", lambda: mk_decode_iter(1024, 512))
    probe("decode-iter L=2048 TS=512", lambda: mk_decode_iter(2048, 512))
    probe("decode-iter L=4096 TS=512", lambda: mk_decode_iter(4096, 512))
