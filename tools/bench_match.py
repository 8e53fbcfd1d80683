"""Micro-benchmark of find_matches variants on the real chip.

Scan-amortized (same methodology as bench.py); reports ms per 2 MiB
dispatch for each (S, J, reset, two_phase) variant passed on the
command line as S,J,reset,two_phase tuples, default a sweep.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from zlibes_tpu.config import CodecConfig
from zlibes_tpu.ops.lz77 import find_matches


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    raw = (Path(__file__).parent.parent / "tests" / "golden" / "raw.bin"
           ).read_bytes()
    data = b"".join(raw[i * 60000:] + raw[: i * 60000] for i in range(8))
    cfg = CodecConfig.turbo()
    N = cfg.block_size
    Bp = cfg.blocks_per_dispatch
    arr = np.frombuffer(data, np.uint8)
    nblocks = min(Bp, -(-len(data) // N))
    blk = np.zeros((Bp, N + 8), np.uint8)
    nv = np.zeros(Bp, np.int32)
    for i in range(nblocks):
        c = arr[i * N:(i + 1) * N]
        blk[i, : c.size] = c
        nv[i] = c.size
    dbytes = nblocks * N
    K = 4
    blk_stack = jnp.asarray(np.stack([blk] * K))
    nv_dev = jnp.asarray(nv)

    @jax.jit
    def _null(x):
        return x + 1
    _sync(_null(jnp.int32(0)))
    samples = []
    for k in range(5):  # median of several dispatches (ADVICE r2)
        t0 = time.perf_counter()
        _sync(_null(jnp.int32(k)))
        samples.append(time.perf_counter() - t0)
    rpc = float(np.median(samples))
    print(f"rpc floor {rpc*1e3:.1f} ms", file=sys.stderr)

    variants = [(16, 16, 4096, True), (8, 16, 4096, True),
                (8, 8, 4096, True), (16, 8, 4096, True)]
    if len(sys.argv) > 1:
        variants = [tuple(int(x) for x in v.split(",")) for v in sys.argv[1:]]
        variants = [(s, j, r, bool(t)) for s, j, r, t in variants]

    for (S, J, reset, tp) in variants:
        def run(stack, nvv):
            def body(c, b):
                m = find_matches(b, nvv, N=N, S=S, J=J, reset=reset,
                                 two_phase=tp)
                return c + m[0, 0] + m[-1, -1], None
            return jax.lax.scan(body, jnp.int32(0), stack)[0]
        jfn = jax.jit(run)
        t0 = time.perf_counter()
        _sync(jfn(blk_stack, nv_dev))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(jfn(blk_stack, nv_dev))
            ts.append(time.perf_counter() - t0)
        t = (float(np.median(ts)) - rpc) / K
        print(f"S={S} J={J} reset={reset} tp={tp}: {t*1e3:.2f} ms "
              f"-> {dbytes/t/1e9:.3f} GB/s (compile {comp:.0f}s)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
