"""Public two-function API (reference analog src/zlib.ts:11,25).

Dispatches between the TPU pipeline (default when a jax backend is usable)
and the pure-NumPy reference model (always available, ``backend="refmodel"``).
"""
from __future__ import annotations

from ..spec import refmodel as _rm


def _tpu_modules():
    try:
        from . import deflate_pipeline
    except ImportError:
        deflate_pipeline = None
    try:
        from . import inflate_pipeline
    except ImportError:
        inflate_pipeline = None
    return deflate_pipeline, inflate_pipeline


def deflate(data: bytes, *, backend: str = "auto", block_size: int | None = None) -> bytes:
    """Compress ``data`` into a zlib stream (header 0x78 0x9C + Adler-32)."""
    kw = {"block_size": block_size} if block_size else {}
    if backend != "refmodel":
        dp, _ = _tpu_modules()
        if dp is not None:
            return dp.deflate(bytes(data), **kw)
        if backend != "auto":
            raise ValueError(f"unknown backend {backend!r}")
    return _rm.deflate(bytes(data), **kw)


def inflate(data: bytes, *, backend: str = "auto", verify_checksum: bool = True) -> bytes:
    """Decompress a zlib stream, verifying the Adler-32 trailer."""
    if backend != "refmodel":
        _, ip = _tpu_modules()
        if ip is not None:
            return ip.inflate(bytes(data), verify_checksum=verify_checksum)
        if backend != "auto":
            raise ValueError(f"unknown backend {backend!r}")
    return _rm.inflate(bytes(data), verify_checksum=verify_checksum)
