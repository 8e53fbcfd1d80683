"""CodecConfig levels, stats, and observability."""
import zlib as pyzlib
from pathlib import Path

import pytest

import zlibes_tpu
from zlibes_tpu import CodecConfig, CodecStats

RAW = (Path(__file__).parent / "golden" / "raw.bin").read_bytes()[:131072]


def test_level_presets():
    sizes = {}
    for level in [0, 1, 6]:
        out = zlibes_tpu.deflate(RAW, level=level)
        assert pyzlib.decompress(out) == RAW
        sizes[level] = len(out)
    assert sizes[0] > len(RAW)  # stored
    assert sizes[6] < sizes[1] < sizes[0]


def test_level_validation():
    with pytest.raises(ValueError):
        CodecConfig.from_level(10)


def test_stats_collection():
    st = CodecStats()
    out = zlibes_tpu.deflate(RAW, stats=st)
    assert st.bytes_in == len(RAW)
    assert st.bytes_out > 0 and st.bytes_out < len(RAW)
    assert st.blocks >= 1 and st.dispatches >= 1
    assert 0 < st.ratio < 1
    assert "match" in st.stage_s


def test_custom_config_seg_size():
    cfg = CodecConfig(seg_size=1024)
    out = zlibes_tpu.deflate(RAW[:65536], config=cfg, block_size=32768)
    assert pyzlib.decompress(out) == RAW[:65536]
