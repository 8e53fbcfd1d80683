"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(SURVEY.md §4); benchmarks run separately on real TPU via bench.py.

Note: this environment's sitecustomize registers an experimental TPU
plugin and force-sets ``jax_platforms`` config, so the JAX_PLATFORMS env
var alone is not enough — we must update the config before any backend
client is created (XLA_FLAGS is parsed once per process, so it must be in
the environment before that first client too).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
