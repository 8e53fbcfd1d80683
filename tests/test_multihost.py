"""Multi-host runtime proof (SURVEY.md §2 "Multi-host runtime",
BASELINE configs[4]): two real jax.distributed processes on localhost,
4 virtual CPU devices each, running the block-parallel codec over the
8-device global mesh — collectives cross the process boundary the same
way they cross DCN on a pod.
"""
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ZLIBES_SKIP_MULTIHOST") == "1",
    reason="multihost test disabled by env")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_codec():
    worker = Path(__file__).parent / "mh_worker.py"
    coordinator = f"127.0.0.1:{_free_port()}"
    with tempfile.TemporaryDirectory() as outdir:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, "2", str(pid),
                 outdir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for pid in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out.decode(errors="replace"))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        ok = Path(outdir, "ok").read_text()
        assert "procs=2" in ok and "devices=8" in ok
        comp = Path(outdir, "comp.bin").read_bytes()
        import zlib

        assert zlib.decompress(comp)  # cross-validated in-worker too
