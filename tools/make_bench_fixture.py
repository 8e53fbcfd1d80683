"""Generate the precompressed bench fixture (stream + sidecar index).

Run on the CPU backend (fast compiles; the emitted stream format is
backend-independent): the driver's bench then measures only the inflate
path instead of paying the encode pipeline's cold-compile cost on the
tunneled TPU platform.

    JAX_PLATFORMS=cpu python tools/make_bench_fixture.py
"""
from __future__ import annotations

import sys
import zlib as pyzlib
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def bench_data() -> bytes:
    raw = (ROOT / "tests" / "golden" / "raw.bin").read_bytes()
    # ~3.8 MB of corpus-like data: rotated copies (verbatim repetition would
    # manufacture pathological cross-copy back-reference chains no real
    # mixed corpus exhibits)
    return b"".join(raw[i * 60000:] + raw[: i * 60000] for i in range(8))


def main() -> None:
    from zlibes_tpu.codec import deflate_pipeline as dp

    data = bench_data()
    comp, index = dp.deflate(data, with_index=True)
    assert pyzlib.decompress(comp) == data
    out_dir = ROOT / "tests" / "golden"
    (out_dir / "bench_stream.zz").write_bytes(comp)
    index.save(out_dir / "bench_stream.idx.npz")
    print(f"fixture: {len(comp)} compressed bytes, "
          f"{len(index.blocks)} blocks, {index.anchor_bit.size} anchors")


if __name__ == "__main__":
    main()
