"""Microbenchmark: what can Pallas on this TPU actually do for a Huffman
decoder?  Measures per-op cost of the primitives the lock-step inflate
kernel needs: in-kernel dynamic gather (table lookup), window refill,
and a full mock decode-loop iteration.

Run on the real TPU:  python tools/probe_pallas.py
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


def bench(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def probe(name, build):
    try:
        fn, args, work = build()
        dt, _ = bench(fn, *args)
        print(f"{name:44s} {dt*1e6:10.1f} us  {work/dt/1e9:8.2f} G/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:44s} FAILED: {type(e).__name__}: {msg}")
    sys.stdout.flush()


LOOPS = 512


def mk_gather(L, TS):
    """L lanes, table of TS int32; LOOPS sequential dependent lookups."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (1, TS) or (8, TS)
        def body(i, idx):
            v = jnp.take_along_axis(
                tab, idx % TS, axis=1)
            return (v + i) % TS
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body, idx_ref[:])

    @jax.jit
    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    rows = max(1, L // 128)
    tab = jnp.arange(rows * TS, dtype=jnp.int32).reshape(rows, TS) % TS
    idx = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128) % TS
    work = LOOPS * rows * 128  # lookups
    return fn, (tab, idx), work


def mk_gather2d(L, TS):
    """per-row table: (R,TS) table, (R,128) idx, take_along_axis rowwise."""
    return mk_gather(L, TS)


def mk_onehot_mxu(L, TS):
    """one-hot matmul lookup: (L,TS) onehot @ (TS,1)."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (TS, 8) f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 1)

        def body(i, idx):
            oh = (iota == idx[:, None]).astype(jnp.float32)
            v = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            return (idx + v[:, 0].astype(jnp.int32) + i) % TS
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body, idx_ref[:, 0])[:, None]

    @jax.jit
    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    tab = (jnp.arange(TS * 8, dtype=jnp.float32).reshape(TS, 8)) % TS
    idx = jnp.arange(L, dtype=jnp.int32)[:, None] % TS
    work = LOOPS * L
    return fn, (tab, idx), work


def mk_xla_gather(B, TS):
    """baseline: XLA (non-pallas) dependent gather loop."""
    def step(i, idx):
        return (tab_g[idx] + i) % TS

    @jax.jit
    def fn(idx):
        return jax.lax.fori_loop(0, LOOPS, step, idx)

    global tab_g
    tab_g = jnp.arange(TS, dtype=jnp.int32) % TS
    idx = jnp.arange(B, dtype=jnp.int32) % TS
    return fn, (idx,), LOOPS * B


def mk_vpu_flops(L):
    """VPU elementwise throughput reference."""
    def kernel(x_ref, out_ref):
        def body(i, x):
            return x * 1.0001 + 0.5
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((L // 128, 128), jnp.float32)
    return fn, (x,), LOOPS * L


def mk_decode_iter(R, TS):
    """mock decode-loop iteration: window shift + table lookup + per-lane
    variable advance, (R,128) lanes, table (R,TS) per-row."""
    def kernel(tab_ref, w_ref, out_ref):
        tab = tab_ref[:]

        def body(i, carry):
            w, bits = carry
            idx = w & (TS - 1)
            e = jnp.take_along_axis(tab, idx, axis=1)
            k = (e & 15) + 1
            w = (w >> k) | (e << (32 - k))
            bits = bits + k
            return (w, bits)
        w, bits = jax.lax.fori_loop(0, LOOPS, body, (w_ref[:], jnp.zeros_like(w_ref[:])))
        out_ref[:] = bits

    @jax.jit
    def fn(tab, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(w.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, w)

    tab = jnp.arange(R * TS, dtype=jnp.int32).reshape(R, TS) % 16
    w = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128)
    return fn, (tab, w), LOOPS * R * 128


if __name__ == "__main__":
    print("dev:", jax.devices())
    probe("vpu f32 fma (8,128)", lambda: mk_vpu_flops(1024))
    probe("vpu f32 fma (64,128)", lambda: mk_vpu_flops(64 * 128))
    probe("pallas gather row=1 tab=512", lambda: mk_gather(128, 512))
    probe("pallas gather row=8 tab=512", lambda: mk_gather(1024, 512))
    probe("pallas gather row=8 tab=2048", lambda: mk_gather(1024, 2048))
    probe("pallas gather row=8 tab=32768", lambda: mk_gather(1024, 32768))
    probe("pallas gather row=64 tab=512", lambda: mk_gather(64 * 128, 512))
    probe("pallas gather row=64 tab=2048", lambda: mk_gather(64 * 128, 2048))
    probe("pallas onehot-mxu L=1024 tab=512", lambda: mk_onehot_mxu(1024, 512))
    probe("pallas decode-iter rows=8 tab=2048", lambda: mk_decode_iter(8, 2048))
    probe("pallas decode-iter rows=64 tab=2048", lambda: mk_decode_iter(64, 2048))
    probe("xla gather loop B=1024 tab=32768", lambda: mk_xla_gather(1024, 32768))
    probe("xla gather loop B=8192 tab=32768", lambda: mk_xla_gather(8192, 32768))
