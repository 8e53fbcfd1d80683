"""Device-side DEFLATE encode stages: symbol mapping, histograms, bit-packing.

Reference analog: the per-symbol encode loop at src/deflate.ts:183-226,
which calls BitWriteStream.write once *per bit*.  TPU-native redesign:
tokens map to (code, nbits) fields via table gathers, bit offsets come from
an exclusive scan of field widths, and the payload is materialized with
word scatter-adds (each ≤15-bit field touches at most two u32 words).
Everything is batched over all blocks/segment-lanes of a dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import constants as C

# device-resident value→symbol tables
_LEN_SYM = jnp.asarray(C.LENGTH_TO_SYMBOL)          # (259,)
_LEN_EXTRA_VAL = jnp.asarray(C.LENGTH_TO_EXTRA)     # (259,)
_LEN_EXTRA_N = jnp.asarray(
    np.concatenate([np.zeros(257, np.int32), C.LENGTH_EXTRA_BITS])
)  # indexed by litlen symbol
_DIST_SYM = jnp.asarray(C.DIST_TO_SYMBOL)           # (32769,)
_DIST_EXTRA_VAL = jnp.asarray(C.DIST_TO_EXTRA)
_DIST_EXTRA_N = jnp.asarray(C.DIST_EXTRA_BITS)      # (30,)


@partial(jax.jit, static_argnames=("nseg",))
def token_symbols(
    toks_val: jax.Array,   # int32 (L, T)
    toks_dist: jax.Array,  # int32 (L, T)
    count: jax.Array,      # int32 (L,)
    nseg: int,             # segment lanes per block
):
    """Map tokens to litlen/dist symbols and build per-block histograms.

    Returns (lsym, dsym, valid, ll_freq (B,288), d_freq (B,32)); dsym is -1
    for literals.
    """
    L, T = toks_val.shape
    B = L // nseg
    tidx = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
    valid = tidx < count[:, None]
    is_match = valid & (toks_dist > 0)
    vs = jnp.clip(toks_val, 0, C.MAX_MATCH)
    lsym = jnp.where(is_match, _LEN_SYM[vs], toks_val)
    lsym = jnp.where(valid, lsym, 0)
    ds = jnp.clip(toks_dist, 0, C.WINDOW_SIZE)
    dsym = jnp.where(is_match, _DIST_SYM[ds], -1)

    blk = jax.lax.broadcasted_iota(jnp.int32, (L, T), 0) // nseg
    llidx = jnp.where(valid, blk * C.NUM_LITLEN_SYMBOLS + lsym,
                      B * C.NUM_LITLEN_SYMBOLS)
    ll_freq = jnp.zeros(B * C.NUM_LITLEN_SYMBOLS, jnp.int32).at[
        llidx.reshape(-1)
    ].add(1, mode="drop").reshape(B, C.NUM_LITLEN_SYMBOLS)
    didx = jnp.where(is_match, blk * C.NUM_DIST_SYMBOLS + dsym,
                     B * C.NUM_DIST_SYMBOLS)
    d_freq = jnp.zeros(B * C.NUM_DIST_SYMBOLS, jnp.int32).at[
        didx.reshape(-1)
    ].add(1, mode="drop").reshape(B, C.NUM_DIST_SYMBOLS)
    return lsym, dsym, valid, ll_freq, d_freq


@partial(jax.jit, static_argnames=("nseg", "W"))
def pack_payload(
    toks_val: jax.Array,    # int32 (L, T)
    toks_dist: jax.Array,   # int32 (L, T)
    lsym: jax.Array,        # int32 (L, T)
    dsym: jax.Array,        # int32 (L, T) (-1 for literals)
    valid: jax.Array,       # bool (L, T)
    ll_code: jax.Array,     # uint32 (B, 288) bit-reversed codes (LSB-first)
    ll_len: jax.Array,      # int32 (B, 288)
    d_code: jax.Array,      # uint32 (B, 32)
    d_len: jax.Array,       # int32 (B, 32)
    hdr_bits: jax.Array,    # int32 (B,) header length (incl. 3-bit prefix)
    enabled: jax.Array,     # bool (B,) pack this block (not stored)
    nseg: int,
    W: int,                 # u32 words per block buffer
):
    """Scatter all token bit-fields into per-block word buffers.

    Returns (words (B, W) uint32, payload_end_bits (B,), lane_bit0 (L,)):
    payload_end_bits = bit offset just after the last token (EOB not
    included — the host appends it); lane_bit0 = bit offset of each segment
    lane's first token (the decode anchors).
    """
    L, T = toks_val.shape
    B = L // nseg
    blk2 = jax.lax.broadcasted_iota(jnp.int32, (L, T), 0) // nseg
    is_match = valid & (toks_dist > 0)

    vs = jnp.clip(toks_val, 0, C.MAX_MATCH)
    ds = jnp.clip(toks_dist, 0, C.WINDOW_SIZE)
    lflat = blk2 * C.NUM_LITLEN_SYMBOLS + jnp.clip(lsym, 0, 287)
    f1v = ll_code.reshape(-1)[lflat]
    f1n = jnp.where(valid, ll_len.reshape(-1)[lflat], 0)
    f2v = jnp.where(is_match, _LEN_EXTRA_VAL[vs], 0).astype(jnp.uint32)
    f2n = jnp.where(is_match, _LEN_EXTRA_N[jnp.clip(lsym, 0, 287)], 0)
    dflat = blk2 * C.NUM_DIST_SYMBOLS + jnp.clip(dsym, 0, 31)
    f3v = jnp.where(is_match, d_code.reshape(-1)[dflat], 0)
    f3n = jnp.where(is_match, d_len.reshape(-1)[dflat], 0)
    f4v = jnp.where(is_match, _DIST_EXTRA_VAL[ds], 0).astype(jnp.uint32)
    f4n = jnp.where(is_match, _DIST_EXTRA_N[jnp.clip(dsym, 0, 29)], 0)

    tb = f1n + f2n + f3n + f4n  # total bits per token

    # bit offsets: within-lane exclusive scan + per-lane base within block
    lane_tot = jnp.sum(tb, axis=1)
    lane_cum = jnp.cumsum(lane_tot) - lane_tot  # global over lanes
    lane_id = jnp.arange(L, dtype=jnp.int32)
    blk_first = (lane_id // nseg) * nseg
    lane_base = lane_cum - lane_cum[blk_first]  # reset at block starts
    within = jnp.cumsum(tb, axis=1) - tb
    blk1 = lane_id // nseg
    tok_off = (lane_base + hdr_bits[blk1])[:, None] + within
    lane_bit0 = lane_base + hdr_bits[blk1]
    payload_end = jnp.zeros(B, jnp.int32).at[blk1].add(lane_tot) + hdr_bits

    words = jnp.zeros(B * W, jnp.uint32)
    en = enabled[blk2] & valid

    def scatter_field(words, v, n, off):
        v = v.astype(jnp.uint32) & ((jnp.uint32(1) << jnp.uint32(
            jnp.clip(n, 0, 31))) - 1)
        w = blk2 * W + (off >> 5)
        sh = (off & 31).astype(jnp.uint32)
        use = en & (n > 0)
        widx = jnp.where(use, w, B * W).reshape(-1)
        lo = (v << sh).reshape(-1)
        words = words.at[widx].add(lo, mode="drop")
        hi = jnp.where(sh == 0, jnp.uint32(0), v >> (jnp.uint32(32) - sh))
        widx2 = jnp.where(use & (hi > 0), w + 1, B * W).reshape(-1)
        words = words.at[widx2].add(hi.reshape(-1), mode="drop")
        return words

    o = tok_off
    words = scatter_field(words, f1v, f1n, o)
    o = o + f1n
    words = scatter_field(words, f2v, f2n, o)
    o = o + f2n
    words = scatter_field(words, f3v, f3n, o)
    o = o + f3n
    words = scatter_field(words, f4v, f4n, o)

    return words.reshape(B, W), payload_end, lane_bit0


@jax.jit
def gather_compressed(words_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Compact per-block word buffers into one dense array for download."""
    return words_flat[idx]
