"""Scan-amortized per-stage profiling of the turbo inflate device stages."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from zlibes_tpu.codec import deflate_pipeline as dp
from zlibes_tpu.codec import turbo as tb
from zlibes_tpu.config import CodecConfig
from zlibes_tpu.ops import turbo_kernel as tk
from zlibes_tpu.ops.adler32 import adler32_device


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    raw = (Path(__file__).parent.parent / "tests" / "golden" / "raw.bin"
           ).read_bytes()
    data = b"".join(raw[i * 60000:] + raw[: i * 60000] for i in range(8))
    comp, index = dp.deflate(data, with_index=True,
                             config=CodecConfig.turbo())
    plan = tb.TurboPlan.build(comp, index)
    print(f"L={plan.L} L_pad={plan.L_pad} T={plan.T} C_pad={plan.C_pad}",
          file=sys.stderr)

    @jax.jit
    def _null(x):
        return x + 1
    _sync(_null(jnp.int32(0)))
    samples = []
    for k in range(5):
        t0 = time.perf_counter()
        _sync(_null(jnp.int32(k)))
        samples.append(time.perf_counter() - t0)
    rpc = float(np.median(samples))
    print(f"rpc floor {rpc*1e3:.1f} ms", file=sys.stderr)

    K = 8
    nbytes = len(data)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        _sync(jfn(*args))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(jfn(*args))
            ts.append(time.perf_counter() - t0)
        t = (float(np.median(ts)) - rpc) / K
        print(f"{name}: {t*1e3:.3f} ms -> {nbytes/t/1e9:.2f} GB/s eq",
              file=sys.stderr, flush=True)
        return t

    def scan_over(fn, x):
        stack = jnp.asarray(np.stack([np.asarray(x)] * K))

        def run(stack, *rest):
            def body(c, b):
                return c + fn(b, *rest), None
            return jax.lax.scan(body, jnp.int32(0), stack)[0]
        return run, stack

    # stage inputs
    fetched = tk.extract_lanes(plan.words, plan.starts_w)
    lanes = tk.shift_lanes(fetched, plan.shift_idx, LB=plan.LB)
    planes = tb._to_planes(lanes, LB=plan.LB)
    tg, mg = tk.decode_turbo(planes, plan.bit0, plan.endb, plan.lt, plan.dt,
                             T=plan.T, LB=plan.LB)
    t16, s16 = tb._glue_tokens(tg, mg[0], plan.base_g, T=plan.T,
                               C_pad=plan.C_pad, LB=plan.LB)

    f, st = scan_over(lambda w, sw: tk.extract_lanes(w, sw)[0, 0],
                      plan.words)
    timeit("extract", f, st, plan.starts_w)

    f, st = scan_over(lambda r, ix: tk.shift_lanes(r, ix, LB=plan.LB)[0, 0],
                      fetched)
    timeit("shift", f, st, plan.shift_idx)

    def dec(p, b0, eb, lt, dt):
        tg, mg = tk.decode_turbo(p, b0, eb, lt, dt, T=plan.T, LB=plan.LB)
        return tg[0, 0, 0] + mg[0, 0, 0]
    f, st = scan_over(dec, planes)
    timeit("decode", f, st, plan.bit0, plan.endb, plan.lt, plan.dt)

    def glue(tg, mg0, base_g):
        t16, s16 = tb._glue_tokens(tg, mg0, base_g, T=plan.T,
                                   C_pad=plan.C_pad, LB=plan.LB)
        return jnp.sum(t16[0, :, 0]) + jnp.sum(s16[:, 0, 0])
    f, st = scan_over(glue, tg)
    timeit("glue", f, st, mg[0], plan.base_g)

    def res(t16, s16):
        return tk.resolve_turbo(t16, s16)[0, 0].astype(jnp.int32)
    f, st = scan_over(res, t16)
    timeit("resolve", f, st, s16)

    def adl(rows):
        flat = rows.reshape(-1)[: plan.total_out]
        return adler32_device(flat, plan.total_out).astype(jnp.int32)
    rows = tk.resolve_turbo(t16, s16)
    f, st = scan_over(adl, rows)
    timeit("adler", f, st)


if __name__ == "__main__":
    main()
