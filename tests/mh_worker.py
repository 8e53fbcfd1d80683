"""Multi-host worker: one process of a 2-process jax.distributed run.

Launched by tests/test_multihost.py:
    python tests/mh_worker.py <coordinator> <nproc> <pid> <outdir>
Each process owns 4 virtual CPU devices; the global mesh has 8.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    coordinator, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    # distributed init must precede anything that touches the backend —
    # including package imports that build device constants
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    from zlibes_tpu.parallel import multihost
    from zlibes_tpu.parallel.block_parallel import (
        parallel_deflate, parallel_inflate)
    from zlibes_tpu.spec import refmodel as rm
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    mesh = multihost.global_mesh()

    rng = np.random.default_rng(42)  # same data on every host
    base = (b"multi host deflate over DCN " * 700
            + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
    data = base * 3

    # host_shard covers the input-feeding convention for per-host sources;
    # every host has the full buffer here, so just sanity-check the split
    lo, hi = multihost.host_shard(total_blocks=8)
    assert 0 <= lo <= hi <= 8

    comp = parallel_deflate(data, mesh, block_size=8192, seg_size=1024)
    import zlib

    assert zlib.decompress(comp) == data, "oracle reject on host %d" % pid

    # round-trip through the block-parallel inflate on the same mesh
    stream2, index2 = rm.deflate(data, block_size=8192, with_index=True,
                                 anchor_every=2048)
    out = parallel_inflate(stream2, index2, mesh)
    assert out == data, "parallel inflate mismatch on host %d" % pid

    if pid == 0:
        Path(outdir, "comp.bin").write_bytes(comp)
        Path(outdir, "ok").write_text(
            f"procs={jax.process_count()} devices={len(jax.devices())}")
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
