"""Probe 2: shape-matched tpu.dynamic_gather cost model + mock decode loop.

Mosaic contract (jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule):
take_along_axis(tab, idx, axis=0|1) with tab.shape == idx.shape, 2D.
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


def bench(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def probe(name, build):
    try:
        fn, args, useful = build()
        dt, _ = bench(fn, *args)
        per_it = dt / LOOPS
        print(f"{name:52s} {dt*1e6:9.1f} us | {per_it*1e9:8.1f} ns/iter |"
              f" {useful/(per_it):9.2e} useful-lookups/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:52s} FAILED: {type(e).__name__}: {msg}")
    sys.stdout.flush()


def mk_ta(R, W, axis):
    """take_along_axis, tab (R,W), idx (R,W), dependent loop."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        lim = tab.shape[axis]

        def body(i, idx):
            v = jnp.take_along_axis(tab, idx, axis=axis)
            return (v + 1) % lim
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body, idx_ref[:])

    @jax.jit
    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    lim = (R, W)[axis]
    tab = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W) * 7) % lim
    idx = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W) * 3) % lim
    # useful lookups per iteration: one per row (axis=1) / per col (axis=0)
    useful = R if axis == 1 else W
    return fn, (tab, idx), useful


def mk_mock_decode(NL):
    """Mock lock-step decode iteration, NL lanes as columns (lane = lane-dim).

    Layout: everything (rows, NL) so per-lane gathers run along axis 0
    (sublane gather), lanes along the 128-wide minor dim.
      stream: (768, NL) u32 words (3 KiB compressed per lane)
      rank->symbol table: (320, NL) broadcast (each lane same col content)
    Per iteration: refill window (1 gather range 768), litlen decode via
    canonical compare (15 dense ops) + symbol lookup (1 gather range 320),
    dist decode same (1 gather range 64), advance cursor.
    """
    SW = 768

    def kernel(stream_ref, symtab_ref, out_ref):
        stream = stream_ref[:]
        symtab = symtab_ref[:]

        def body(i, carry):
            bitpos, acc = carry
            # window refill: 2 gathers (u32 pair) along axis 0
            p = bitpos >> 5
            pidx = jnp.broadcast_to(p[None, :], stream.shape) % SW
            w0 = jnp.take_along_axis(stream, pidx, axis=0)[0]
            w1 = jnp.take_along_axis(stream, (pidx + 1) % SW, axis=0)[0]
            s = bitpos & 31
            w = (w0 >> s) | jnp.where(s == 0, 0, w1 << (32 - s))
            # canonical decode: 15 length candidates, arithmetic only
            code = jnp.zeros_like(w)
            length = jnp.zeros_like(w)
            base = jnp.zeros_like(w)
            for l in range(1, 16):
                code = (code << 1) | ((w >> (l - 1)) & 1)
                ok = (length == 0) & (code < (l * 37 % 256))
                length = jnp.where(ok, l, length)
                base = jnp.where(ok, code + l, base)
            rank = (base + length) % 320
            ridx = jnp.broadcast_to(rank[None, :], symtab.shape) % 320
            sym = jnp.take_along_axis(symtab, ridx, axis=0)[0]
            # dist: second smaller decode (reuse window math)
            w2 = w >> (length & 31)
            dcode = w2 & 63
            dsym = (dcode * 3 + sym) % 64
            adv = (length + (dsym & 15) + 5) % 48 + 1
            return (bitpos + adv, acc + sym)
        bitpos = jnp.zeros((NL,), jnp.int32)
        acc = jnp.zeros((NL,), jnp.int32)
        bitpos, acc = jax.lax.fori_loop(0, LOOPS, body, (bitpos, acc))
        out_ref[:] = acc[None, :]

    @jax.jit
    def fn(stream, symtab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, NL), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(stream, symtab)

    stream = jnp.arange(SW * NL, dtype=jnp.uint32).reshape(SW, NL)
    symtab = (jnp.arange(320 * NL, dtype=jnp.int32).reshape(320, NL) * 5) % 288
    return fn, (stream, symtab), NL


if __name__ == "__main__":
    print("dev:", jax.devices())
    probe("ta axis=1 (8,128)", lambda: mk_ta(8, 128, 1))
    probe("ta axis=1 (8,512)", lambda: mk_ta(8, 512, 1))
    probe("ta axis=1 (8,4096)", lambda: mk_ta(8, 4096, 1))
    probe("ta axis=1 (256,512)", lambda: mk_ta(256, 512, 1))
    probe("ta axis=1 (1024,512)", lambda: mk_ta(1024, 512, 1))
    probe("ta axis=0 (128,128)", lambda: mk_ta(128, 128, 0))
    probe("ta axis=0 (512,128)", lambda: mk_ta(512, 128, 0))
    probe("ta axis=0 (768,128)", lambda: mk_ta(768, 128, 0))
    probe("ta axis=0 (768,512)", lambda: mk_ta(768, 512, 0))
    probe("ta axis=0 (4096,128)", lambda: mk_ta(4096, 128, 0))
    probe("mock-decode lanes=128", lambda: mk_mock_decode(128))
    probe("mock-decode lanes=256", lambda: mk_mock_decode(256))
    probe("mock-decode lanes=512", lambda: mk_mock_decode(512))
