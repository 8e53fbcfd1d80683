"""Scan-amortized per-stage profiling of the turbo deflate device stages.

Each stage is timed as ONE jitted lax.scan over K stacked inputs with the
RPC floor subtracted (same methodology as bench.py) so the tunnel latency
and XLA's async dispatch cannot distort the numbers.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from zlibes_tpu.codec.deflate_pipeline import (_encode_tables,
                                               _select_turbo_glue,
                                               package_merge_np)
from zlibes_tpu.config import CodecConfig
from zlibes_tpu.ops.deflate_kernel import (pack_payload, pack_payload_fast,
                                           pack_payload_turbo,
                                           pack_payload_turbo_dense,
                                           token_symbols)
from zlibes_tpu.ops.lz77 import find_matches
from zlibes_tpu.spec import constants as CC


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    raw = (Path(__file__).parent.parent / "tests" / "golden" / "raw.bin"
           ).read_bytes()
    data = b"".join(raw[i * 60000:] + raw[: i * 60000] for i in range(8))
    cfg = CodecConfig.turbo()
    N = cfg.block_size
    nseg = N // cfg.seg_size
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
    t0 = time.perf_counter()
    _sync(_null(jnp.int32(1)))
    rpc = time.perf_counter() - t0
    print(f"rpc floor {rpc*1e3:.1f} ms", file=sys.stderr)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        _sync(jfn(*args))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(jfn(*args))
            ts.append(time.perf_counter() - t0)
        t = (float(np.median(ts)) - rpc) / K
        print(f"{name}: {t*1e3:.2f} ms -> {dbytes/t/1e9:.3f} GB/s",
              file=sys.stderr)
        return t

    # stage args (tables shared, as in _deflate_turbo)
    llf = np.bincount(arr[: 1 << 20], minlength=CC.NUM_LITLEN_SYMBOLS
                      ).astype(np.int64)
    llf[CC.END_OF_BLOCK] += 1
    ll_len = package_merge_np(llf, 9)
    d_len = np.pad(package_merge_np(np.ones(30, np.int64), 9), (0, 2))
    ll_code, d_code = _encode_tables(ll_len, d_len)
    d_code = np.pad(d_code, (0, max(0, 32 - d_code.size)))
    d_len = np.pad(d_len, (0, max(0, 32 - d_len.size)))
    W = (15 * N + 4096) // 32
    tabs = (jnp.asarray(np.broadcast_to(ll_code, (Bp, 288))),
            jnp.asarray(np.broadcast_to(ll_len, (Bp, 288))),
            jnp.asarray(np.broadcast_to(d_code, (Bp, 32))),
            jnp.asarray(np.broadcast_to(d_len, (Bp, 32))))
    hdrb = jnp.full(Bp, 100, jnp.int32)
    en = jnp.ones(Bp, bool)

    def scan_over(fn):
        def run(stack, *rest):
            def body(c, b):
                return c + fn(b, *rest), None
            c, _ = jax.lax.scan(body, jnp.int32(0), stack)
            return c
        return run

    # --- match
    def st_match(b, nv):
        m = find_matches(b, nv, N=N, S=cfg.probe_words, J=cfg.candidates,
                         reset=cfg.chunk_reset, two_phase=True)
        return m[0, 0] + m[-1, -1]
    t_match = timeit("match", scan_over(st_match), blk_stack, nv_dev)

    # fixed inputs for later stages
    m1 = find_matches(jnp.asarray(blk), nv_dev, N=N, S=cfg.probe_words,
                      J=cfg.candidates, reset=cfg.chunk_reset, two_phase=True)
    tv, td, cnt = _select_turbo_glue(jnp.asarray(blk), m1, nv_dev, N=N,
                                     SEG_SIZE=cfg.seg_size, lazy=True,
                                     split_far=True)
    m_stack = jnp.asarray(np.stack([np.asarray(m1)] * K))
    tv_s = jnp.asarray(np.stack([np.asarray(tv)] * K))
    td_s = jnp.asarray(np.stack([np.asarray(td)] * K))
    cnt_s = jnp.asarray(np.stack([np.asarray(cnt)] * K))

    # --- select
    def st_sel(bm, b, nv):
        tv, td, cnt = _select_turbo_glue(b, bm, nv, N=N,
                                         SEG_SIZE=cfg.seg_size, lazy=True,
                                         split_far=True)
        return tv[0, 0] + cnt[0]
    def run_sel(ms, b, nv):
        def body(c, bm):
            return c + st_sel(bm, b, nv), None
        return jax.lax.scan(body, jnp.int32(0), ms)[0]
    timeit("select", run_sel, m_stack, jnp.asarray(blk), nv_dev)

    # --- symbols
    def run_sym(tvs, tds, cnts):
        def body(c, x):
            tv, td, cnt = x
            lsym, dsym, valid, llf, dfq = token_symbols(tv, td, cnt, nseg=nseg)
            return c + lsym[0, 0] + llf[0, 0], None
        return jax.lax.scan(body, jnp.int32(0), (tvs, tds, cnts))[0]
    timeit("symbols", run_sym, tv_s, td_s, cnt_s)

    # --- pack
    lsym, dsym, valid, _lf, _df = token_symbols(tv, td, cnt, nseg=nseg)
    ls_s = jnp.asarray(np.stack([np.asarray(lsym)] * K))
    ds_s = jnp.asarray(np.stack([np.asarray(dsym)] * K))
    va_s = jnp.asarray(np.stack([np.asarray(valid)] * K))

    R = cfg.pack_row_width()
    if "--all" in sys.argv:
        def run_pack(tvs, tds, lss, dss, vas):
            def body(c, x):
                tv, td, ls, ds, va = x
                words, pe, lb = pack_payload(tv, td, ls, ds, va, *tabs,
                                             hdrb, en, nseg=nseg, W=W)
                return c + pe.sum() + words[0, 0].astype(jnp.int32), None
            return jax.lax.scan(body, jnp.int32(0),
                                (tvs, tds, lss, dss, vas))[0]
        timeit("pack", run_pack, tv_s, td_s, ls_s, ds_s, va_s)

        def run_packf(tvs, tds, lss, dss, vas):
            def body(c, x):
                tv, td, ls, ds, va = x
                words, pe, lb = pack_payload_fast(
                    tv, td, ls, ds, va, *tabs, hdrb, en, nseg=nseg, W=W, R=R)
                return c + pe.sum() + words[0, 0].astype(jnp.int32), None
            return jax.lax.scan(body, jnp.int32(0),
                                (tvs, tds, lss, dss, vas))[0]
        timeit("pack_fast", run_packf, tv_s, td_s, ls_s, ds_s, va_s)

        def run_packt(tvs, tds, vas):
            def body(c, x):
                tv, td, va = x
                words, pe, lb, _sb, _so = pack_payload_turbo(
                    tv, td, va, *tabs, hdrb, en, nseg=nseg, W=W, R=R)
                return c + pe.sum() + words[0, 0].astype(jnp.int32), None
            return jax.lax.scan(body, jnp.int32(0), (tvs, tds, vas))[0]
        timeit("pack_turbo", run_packt, tv_s, td_s, va_s)

    # --- pack_dense (compacted-image pack; production)
    def run_packd(tvs, tds, vas):
        def body(c, x):
            tv, td, va = x
            dense, pe, lb, _sb, _so = pack_payload_turbo_dense(
                tv, td, va, *tabs, hdrb, en, jnp.int32(7), nseg=nseg, R=R)
            return c + pe.sum() + dense[0].astype(jnp.int32), None
        return jax.lax.scan(body, jnp.int32(0), (tvs, tds, vas))[0]
    timeit("pack_dense", run_packd, tv_s, td_s, va_s)


if __name__ == "__main__":
    main()
