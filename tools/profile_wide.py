"""Per-stage scan-amortized profile of the wide (default-profile) inflate
pipeline on the real chip.  Usage: python tools/profile_wide.py [level]
"""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zlibes_tpu.codec import deflate_pipeline as dp
from zlibes_tpu.codec import wide as wd
from zlibes_tpu.codec.turbo import _to_planes
from zlibes_tpu.config import CodecConfig
from zlibes_tpu.ops import turbo_kernel as tk
from zlibes_tpu.ops import wide_kernel as wk


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    raw = (Path(__file__).parent.parent / "tests" / "golden"
           / "raw.bin").read_bytes()
    data = b"".join(raw[i * 60000 :] + raw[: i * 60000] for i in range(8))
    comp, index = dp.deflate(data, with_index=True,
                             config=CodecConfig.from_level(level))
    plan = wd.WidePlan.build(comp, index)
    print(f"n={len(data)} comp={len(comp)} SW={plan.SW} Cb={plan.Cb} "
          f"LPB={plan.LPB} L_pad={plan.L_pad}")

    def timed(name, fn, *args, n=6, K=8):
        def body(c, _):
            r = fn(*args)
            leaf = jax.tree_util.tree_leaves(r)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.int32), None

        g = jax.jit(lambda: jax.lax.scan(body, jnp.int32(0), None,
                                         length=K)[0])
        float(np.asarray(g()))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(np.asarray(g()))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.026) / K
        print(f"{name:12s} {t*1e3:8.3f} ms  "
              f"({len(data)/t/1e9:6.2f} GB/s)")
        return t

    fetched = tk.extract_lanes(plan.words, plan.starts_w)
    lanes = wd.wide_lanes(plan.words, plan.starts_w, plan.shift_idx,
                          GF=plan.GF, SW=plan.SW)
    planes = _to_planes(lanes, LB=plan.LB)
    tg, sg, mg = wk.decode_wide(planes, plan.bit0, plan.endb, plan.base_g,
                                plan.lt, plan.dt, T=plan.T, LB=plan.LB)
    toks, starts = wd._glue_wide(tg, sg, mg[0], mg[4], mg[5], T=plan.T,
                                 Cb=plan.Cb, LPB=plan.LPB, LB=plan.LB)

    timed("extract", tk.extract_lanes, plan.words, plan.starts_w)
    tot = 0.0
    tot += timed("ex+shift", lambda: wd.wide_lanes(
        plan.words, plan.starts_w, plan.shift_idx, GF=plan.GF, SW=plan.SW))
    tot += timed("planes", lambda l: _to_planes(l, LB=plan.LB), lanes)
    tot += timed("decode", lambda p: wk.decode_wide(
        p, plan.bit0, plan.endb, plan.base_g, plan.lt, plan.dt, T=plan.T,
        LB=plan.LB), planes)
    tot += timed("glue", lambda a, b: wd._glue_wide(
        a, b, mg[0], mg[4], mg[5], T=plan.T, Cb=plan.Cb, LPB=plan.LPB,
        LB=plan.LB), tg, sg)
    tot += timed("resolve", lambda a, b: wk.resolve_wide(
        a, b, NSUBB=plan.LPB), toks, starts)
    print(f"{'stage sum':12s} {tot*1e3:8.3f} ms  "
          f"({len(data)/tot/1e9:6.2f} GB/s)")


if __name__ == "__main__":
    main()
