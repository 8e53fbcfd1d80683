"""Smoke bench: the mandatory pre-commit gate for the driver bench.

Runs the EXACT turbo pipeline bench.py measures — deflate with
CodecConfig.turbo() on a corpus slice that includes the round-2 killer
pattern (zero-byte runs right after high bytes, i.e. raw.bin's own first
KB) — and asserts the full correctness contract:

  * CPython zlib (the untrusted oracle) decodes our stream back
    bit-exactly (reference contract /root/reference/test/index.js:65-86);
  * our own turbo inflate round-trips it;
  * the compressed size meets the per-profile bar recorded in BASELINE.md.

Exit code 0 = safe to commit / run the full bench.  Takes well under a
minute on the tunneled chip and a few minutes cold on CPU.

Usage:  python tools/smoke_bench.py  [--cpu]
"""
from __future__ import annotations

import sys
import time
import zlib as pyzlib
from pathlib import Path

import numpy as np


def main() -> int:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from zlibes_tpu.codec import deflate_pipeline as dp
    from zlibes_tpu.codec import turbo as tb
    from zlibes_tpu.config import CodecConfig

    raw = (Path(__file__).parent.parent / "tests" / "golden" /
           "raw.bin").read_bytes()
    # corpus slice + the adversarial zero-run pattern the round-2 matcher
    # fabricated matches on (raw.bin starts 04 ff ff ff 00 00 ...)
    data = (raw[:262144]
            + bytes([4, 255, 255, 255]) + bytes(4096)
            + b"ab\x00\x00\x00c" * 300
            + raw[200000:240000])

    t0 = time.perf_counter()
    failures = []
    for name, cfg in [("turbo", CodecConfig.turbo()),
                      ("default", None)]:
        comp, index = dp.deflate(data, with_index=True, config=cfg)
        try:
            assert pyzlib.decompress(comp) == data, "oracle mismatch"
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle gate FAILED: {e}")
            continue
        if index.turbo:
            out = tb.inflate_raw_turbo(comp, index)
            if out.tobytes() != data:
                failures.append(f"{name}: self inflate mismatch")
        else:
            from zlibes_tpu.codec.inflate_pipeline import inflate

            if inflate(comp) != data:
                failures.append(f"{name}: self inflate mismatch")
        ratio = len(comp) / len(data)
        print(f"[smoke] {name}: {len(comp)} B (ratio {ratio:.4f}) OK",
              file=sys.stderr)
        # the shipped corpus is zlib-6-class compressible; any profile
        # worse than zlib-1 on it signals a selection/pack regression
        bar = len(pyzlib.compress(data, 1))
        if len(comp) > bar:
            failures.append(
                f"{name}: size {len(comp)} worse than zlib-1 ({bar})")

    print(f"[smoke] total {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if failures:
        for f in failures:
            print(f"[smoke] FAIL: {f}", file=sys.stderr)
        return 1
    print("[smoke] all gates green", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
