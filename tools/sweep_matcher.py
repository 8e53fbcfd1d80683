"""Speed/ratio sweep of the turbo matcher's probe-word count S.

The matcher's 10-operand lax.sort is ~8 of 11 ms per 2 MiB dispatch
(round-3 profile); each probe word riding the sort costs ~1 operand.
This sweep measures the SIZE cost of shorter probe chains (match-length
cap = 4*S + 3 bytes) so the speed/ratio knee is chosen on data.

  python tools/sweep_matcher.py          # sizes on CPU (deterministic)
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import zlib as pyzlib  # noqa: E402


def main() -> None:
    from zlibes_tpu.codec import deflate_pipeline as dp
    from zlibes_tpu.config import CodecConfig

    raw = (Path(__file__).resolve().parent.parent
           / "tests" / "golden" / "raw.bin").read_bytes()
    out = {}
    for S in (4, 6, 8, 12):
        cfg = CodecConfig.turbo(probe_words=S)
        comp = dp.deflate(raw, config=cfg)
        assert pyzlib.decompress(comp) == raw
        out[S] = len(comp)
        print(f"S={S}: {len(comp)} bytes "
              f"({(len(comp)/out.get(8, len(comp))-1)*100:+.2f}% vs S=8)"
              if 8 in out else f"S={S}: {len(comp)} bytes",
              file=sys.stderr, flush=True)
    base = out[8]
    print(json.dumps({
        "metric": "turbo_probe_sweep", "corpus": "raw.bin",
        "sizes": {str(k): v for k, v in out.items()},
        "delta_vs_S8_pct": {str(k): round((v / base - 1) * 100, 3)
                            for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()
