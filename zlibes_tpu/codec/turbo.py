"""Turbo inflate pipeline: anchor-lane extraction + Pallas lock-step decode
+ chunk-row LZ resolve, for streams carrying the turbo profile
(CodecConfig.turbo(): shared 9-bit-capped tables, 1 KiB anchors, 4 KiB
window reset).

Replaces the round-1 XLA while_loop decoder (one ~7 ns scalar gather per
index) for the flagship path; foreign / non-turbo streams keep the
general pipelines in inflate_pipeline.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import turbo_kernel as tk
from ..spec import constants as C
from ..spec.errors import CorruptError
from ..spec.refmodel import StreamIndex


def _bucket(n: int, lo: int) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


@partial(jax.jit, static_argnames=("T", "C_pad"))
def _glue_tokens(tokens: jax.Array,  # (T, L) int32 packed
                 counts: jax.Array,  # (L,) int32
                 T: int, C_pad: int):
    """Token post-pass: per-token start offsets + resolve-layout reshape.

    Returns (toks4, starts4): (4, C_pad, TOKENS_PAD) int32 with invalid
    slots carrying start 2048 (past any in-span position).
    """
    L = tokens.shape[1]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0)
    valid = iota_t < counts[None, :]
    ism = (tokens & tk.TOK_MATCH_BIT) != 0
    val = tokens & tk.TOK_VAL_MASK
    lens = jnp.where(valid, jnp.where(ism, val, 1), 0)
    ends = jnp.cumsum(lens, axis=0)
    starts = jnp.where(valid, ends - lens, 2048)
    # (T, L) -> (4, C_pad, TOKENS_PAD)
    def relayout(x, fill):
        x = x.T  # (L, T)
        pad = tk.TOKENS_PAD - T
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        x = x.reshape(C_pad, 4, tk.TOKENS_PAD)
        return jnp.transpose(x, (1, 0, 2))
    return relayout(jnp.where(valid, tokens, 0), 0), relayout(starts, 2048)


def _lane_spans(index: StreamIndex):
    """Per-anchor (bit0, end_bit) absolute spans; anchors are dense every
    1 KiB of output (turbo profile)."""
    na = index.anchor_bit.size
    bit0 = index.anchor_bit.astype(np.int64)
    blk = index.anchor_block.astype(np.int64)
    end = np.empty(na, np.int64)
    end[:-1] = bit0[1:]
    # last anchor of each block ends at the block's end_bit
    blk_end = np.asarray([b.end_bit for b in index.blocks], np.int64)
    last_of_block = np.ones(na, bool)
    last_of_block[:-1] = blk[1:] != blk[:-1]
    end[last_of_block] = blk_end[blk[last_of_block]]
    return bit0, end


class TurboPlan:
    """Host-prepared device arrays for one turbo stream (reusable)."""

    __slots__ = ("words", "starts_w", "bit0", "endb", "lt", "dt", "L", "L_pad",
                 "C_pad", "total_out", "lane_end_check")

    @staticmethod
    def build(data: bytes, index: StreamIndex,
              lane_block: int = tk.LANE_BLOCK) -> "TurboPlan":
        from .inflate_pipeline import _block_code_lengths

        if not getattr(index, "turbo", False):
            raise CorruptError("stream index does not carry the turbo profile")
        for b in index.blocks:
            if b.btype == C.BTYPE_STORED and b.out_len:
                raise CorruptError("turbo streams contain no stored data")
        coded = [b for b in index.blocks if b.btype == C.BTYPE_DYNAMIC]
        if not coded:
            raise CorruptError("turbo stream has no coded blocks")
        ll_len, d_len = _block_code_lengths(data, coded[0])
        lt, dt = tk.turbo_decode_tables(ll_len, d_len)

        bit0_abs, end_abs = _lane_spans(index)
        L = bit0_abs.size
        # sanity: anchors dense at 1 KiB grid
        if not np.array_equal(index.anchor_out,
                              np.arange(L, dtype=np.int64) * 1024):
            raise CorruptError("turbo anchors must tile output every 1 KiB")
        starts_w = (bit0_abs >> 5).astype(np.int32)
        bit0_in = (bit0_abs - (starts_w.astype(np.int64) << 5)).astype(np.int32)
        endb_in = (end_abs - (starts_w.astype(np.int64) << 5)).astype(np.int32)
        if int(endb_in.max(initial=0)) > (tk.STREAM_WORDS - 2) * 32:
            raise CorruptError("anchor span exceeds the lane stream window")

        p = TurboPlan()
        p.L = L
        p.L_pad = _bucket(L, lane_block)
        p.C_pad = _bucket(-(-p.L_pad // 4), tk.CHUNK_BLOCK)
        if p.C_pad * 4 > p.L_pad:
            p.L_pad = p.C_pad * 4
        p.total_out = index.total_out

        raw = np.frombuffer(data, np.uint8)
        npad = (-raw.size) % 4 + 4 * (tk.STREAM_WORDS + 2)
        words = np.concatenate([raw, np.zeros(npad, np.uint8)]).view("<u4")
        nw = _bucket(words.size, 4096)
        p.words = jnp.asarray(np.pad(words, (0, nw - words.size))
                              .astype(np.int64).astype(np.int32))
        sw = np.zeros(p.L_pad, np.int32)
        b0 = np.zeros((p.L_pad, 1), np.int32)
        eb = np.zeros((p.L_pad, 1), np.int32)
        sw[:L] = starts_w
        b0[:L, 0] = bit0_in
        eb[:L, 0] = endb_in
        p.starts_w = jnp.asarray(sw)
        p.bit0 = jnp.asarray(b0)
        p.endb = jnp.asarray(eb)
        p.lane_end_check = endb_in
        p.lt = jnp.asarray(lt)
        p.dt = jnp.asarray(dt)
        return p


def run_turbo(plan: TurboPlan, check: bool = True):
    """Execute the three device stages; returns the (C_pad, 4096) uint8
    chunk rows (device-resident) — output bytes are rows flattened and cut
    at plan.total_out."""
    lanes = tk.extract_lanes(plan.words, plan.starts_w)
    tokens, meta = tk.decode_turbo(lanes, plan.bit0, plan.endb,
                                   plan.lt, plan.dt)
    if check:
        m = np.asarray(meta)
        L = plan.L
        if m[2, :L].any() or m[3, :L].any():
            raise CorruptError("invalid Huffman data in turbo lane")
        if not (m[1, :L] == plan.lane_end_check).all():
            raise CorruptError("turbo lane did not end at its anchor")
    toks4, starts4 = _glue_tokens(tokens, meta[0], T=tokens.shape[0],
                                  C_pad=plan.C_pad)
    return tk.resolve_turbo(toks4, starts4)


def inflate_raw_turbo(data: bytes, index: StreamIndex,
                      check: bool = True) -> np.ndarray:
    """Full turbo inflate of a stream produced by CodecConfig.turbo().

    Returns the decompressed bytes as a host uint8 array.
    """
    plan = TurboPlan.build(data, index)
    rows = run_turbo(plan, check=check)
    flat = rows.reshape(-1)[: plan.total_out]
    return np.asarray(flat)
