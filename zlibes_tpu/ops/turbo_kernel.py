"""Pallas lock-step inflate kernels for turbo-profile streams.

This is the TPU replacement for the reference's bit-serial symbol loop
(/root/reference/src/inflate.ts:237-291) and byte-at-a-time LZ back-copy
(/root/reference/src/inflate.ts:287-290).  It decodes streams produced by
``CodecConfig.turbo()`` — 100% zlib-conformant members whose structure is
chosen for lock-step vector decode:

  * one shared (litlen, dist) table pair for the whole stream, code
    lengths capped at 9 bits → decode tables are 512 packed int32
    entries, served by shape-matched vreg gathers (tpu.dynamic_gather);
  * decode anchors every 512 B of output → thousands of independent
    sub-chunk lanes decode in lock step, one symbol per lane per loop
    iteration;
  * LZ window reset every 4 KiB of output → back-references never leave a
    4 KiB chunk, so resolution is chunk-row-local: the resolve kernel
    walks each chunk in 128-byte tiles, serving sources in already-written
    tiles from VMEM with banked per-vreg gathers and in-tile overlaps with
    log2(128) pointer-doubling rounds.

Decode-loop design notes (cost model measured via scan-amortized timing —
the only trustworthy method on this setup, tools/probe_pallas*.py):

  * All per-lane state lives in one (8, 128) vreg per variable, so the
    ~40 scalar ops per iteration cost ~40 vector instructions total.
  * Table lookups are per-bank vreg gathers from (8, 128) tiles whose
    sublanes all hold the same 128 table entries; 4 banks + selects serve
    all 1024 lanes in ~10 instructions.
  * The stream refill is the throughput floor: the per-lane word fetch is
    a log-tree of vreg selects over the word-planes (no gather-friendly
    layout exists for it).  The round-4 decode loop processes TWO tokens
    per iteration with ONE paired 64-bit refill into a 128-bit shift
    buffer: split_far caps every coded token at 32 bits, so a token pair
    consumes <= 64 bits — exactly the refill rate — and the pair-aligned
    cursor halves the select tree (two 47-trees sharing one index vreg
    vs one 95-tree per token).
  * Decode lanes are sorted by bit-span at 4 KiB-chunk granularity
    (TurboPlan.build), so each 1024-lane grid block runs only to ITS max
    token count; the glue's intra-chunk lane adjacency survives and only
    the final resolve rows are un-permuted.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import constants as C
from ..spec.errors import CorruptError
from . import huffman

# table width: turbo streams cap code lengths at 9 bits
M_BITS = 9
TABLE = 1 << M_BITS
# output bytes per SELECTION segment (one anchor PAIR per SEG_SPAN: the
# encoder records a second anchor at the first token starting at-or-after
# byte SUB of the segment, so every decode lane covers roughly half a
# segment — see pack_payload_turbo's anchor-split outputs)
SEG_SPAN = 512
# output bytes per resolve sub-span; decode lane l feeds sub-span l (the
# token crossing the mid-segment boundary is duplicated into the odd
# sub-span's slot 0 with a negative start — see _glue_tokens in turbo.py)
SUB = 256
SUBS_PER_CHUNK = 4096 // SUB
# decode lanes per kernel invocation
LANE_BLOCK = 1024
# stream words per decode lane.  A lane's tokens all start within one
# SUB-byte half-segment, so ≤ SUB of them, and a (match, literal) mix
# maximizing coded bits yields ≤ 86·32 + slack ≈ 2790 bits; + the ≤31-bit
# sub-word start offset + 2 words of refill lookahead → 91, padded to 96.
# Extraction DMAs two 128-word-aligned blocks per lane (residue ≤ 127
# words + 91 ≤ 218 < 256) and a fused shift pass drops the residue.
STREAM_WORDS = 96
# words per lane fetched by the DMA extraction pass (pre-shift)
FETCH_WORDS = 256
# max tokens per decode lane: ≤ SUB+1 starters (+ the crossing token) + slack
MAX_TOKENS = 272
# token-array width in the resolve kernel (>= MAX_TOKENS + 1 cross slot)
TOKENS_PAD = 384
# chunk rows per resolve kernel invocation
CHUNK_BLOCK = 128

# token packing: val (literal byte / match length) | dist<<9 | is_match<<21
TOK_VAL_MASK = 0x1FF
TOK_DIST_SHIFT = 9
TOK_DIST_MASK = 0xFFF
TOK_MATCH_BIT = 1 << 21

_KIND_LIT, _KIND_EOB, _KIND_LEN, _KIND_INVALID = 0, 1, 2, 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# table construction (host, header-sized work)

def turbo_decode_tables(ll_len: np.ndarray, d_len: np.ndarray):
    """Flat LSB-first decode tables as packed int32, replicated across the
    8 sublanes for per-vreg bank gathers.

    Returns (lt (8, 512) int32, dt (8, 512) int32).
      litlen entry: codelen(4b) | kind(2b @4) | extra#(3b @6) | base(9b @9)
      dist entry:   codelen(4b) | extra#(4b @4) | base(15b @8)
    codelen 0 marks an invalid bit pattern.
    """
    ll_len = np.asarray(ll_len, np.int64)
    d_len = np.asarray(d_len, np.int64)
    if int(ll_len.max(initial=0)) > M_BITS or int(d_len.max(initial=0)) > M_BITS:
        raise CorruptError("turbo stream requires code lengths <= 9 bits")

    def flat(lengths, entry_fn):
        codes = huffman.canonical_codes_batch(lengths[None, :])[0]
        tab = np.zeros(TABLE, np.int32)
        for sym in range(lengths.size):
            l = int(lengths[sym])
            if l == 0:
                continue
            base = int(huffman._REV16[int(codes[sym])] >> (16 - l))
            e = entry_fn(sym, l)
            for idx in range(base, TABLE, 1 << l):
                tab[idx] = e
        return np.broadcast_to(tab, (8, TABLE)).copy()

    def ll_entry(sym, l):
        if sym < 256:
            return l | (_KIND_LIT << 4) | (sym << 9)
        if sym == C.END_OF_BLOCK:
            return l | (_KIND_EOB << 4)
        if sym < 286:
            i = sym - 257
            return (l | (_KIND_LEN << 4) | (int(C.LENGTH_EXTRA_BITS[i]) << 6)
                    | (int(C.LENGTH_BASE[i]) << 9))
        return l | (_KIND_INVALID << 4)

    def d_entry(sym, l):
        if sym < 30:
            return (l | (int(C.DIST_EXTRA_BITS[sym]) << 4)
                    | (int(C.DIST_BASE[sym]) << 8))
        return 0  # reserved distance symbols: invalid

    return flat(ll_len, ll_entry), flat(d_len, d_entry)


# ---------------------------------------------------------------------------
# stage 1: per-lane stream extraction
#
# XLA's vmap(dynamic_slice) lowers to a scalar gather (~3 ns/word — it was
# 72% of the whole inflate), so extraction is a Pallas kernel instead: the
# lane start indices are scalar-prefetched and drive the BlockSpec index
# maps directly, turning the whole stage into pipelined 512-byte DMAs.

def _extract_kernel(A_ref, *refs, nfetch: int):
    out_ref = refs[-1]
    for j in range(8):
        for m in range(nfetch):
            out_ref[j, m * 128 : (m + 1) * 128] = refs[j * nfetch + m][0, 0]


@partial(jax.jit, static_argnames=("nfetch",))
def extract_lanes(blocks128: jax.Array, A: jax.Array,
                  nfetch: int = FETCH_WORDS // 128):
    """Gather each lane's aligned 128-word blocks into its fetch row.

    blocks128: (NB, 128) int32 — the padded stream as aligned word blocks
    A: (L,) int32 — per-lane first block index (starts_w >> 7)
    Returns (L, nfetch*128) int32 rows (alignment residue still present;
    shift_lanes removes it).
    """
    L = A.shape[0]
    assert L % 8 == 0
    grid = (L // 8,)
    blocks3d = blocks128.reshape(blocks128.shape[0], 1, 128)
    in_specs = [
        pl.BlockSpec((1, 1, 128),
                     (lambda i, A_ref, j=j, m=m:
                      (A_ref[i * 8 + j] + m, 0, 0)),
                     memory_space=pltpu.VMEM)
        for j in range(8) for m in range(nfetch)
    ]
    return pl.pallas_call(
        partial(_extract_kernel, nfetch=nfetch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, nfetch * 128),
                                   lambda i, A_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((L, nfetch * 128), jnp.int32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(A, *([blocks3d] * (8 * nfetch)))


def _shift_kernel(rows_ref, idx_ref, out_ref):
    rows = rows_ref[:]
    idx0 = idx_ref[:]                     # (LB, 128): residue + iota
    nb_in = rows_ref.shape[1] // 128
    nb_out = -(-out_ref.shape[1] // 128)
    for b in range(nb_out):
        idx = idx0 + b * 128              # in [0, fetch words)
        lob = idx & 127
        hib = idx >> 7
        out = jnp.zeros_like(idx)
        for m in range(nb_in):
            g = jnp.take_along_axis(rows[:, m * 128 : (m + 1) * 128],
                                    lob, axis=1)
            out = jnp.where(hib == m, g, out)
        w = min(128, out_ref.shape[1] - b * 128)
        out_ref[:, b * 128 : b * 128 + w] = out[:, :w]


@partial(jax.jit, static_argnames=("LB", "SW"))
def shift_lanes(rows: jax.Array,    # (L, fetch words) int32
                idx0: jax.Array,    # (L, 128) int32: per-lane residue + iota
                LB: int = LANE_BLOCK,
                SW: int = STREAM_WORDS):
    """Drop each lane's alignment residue: out[l, w] = rows[l, r_l + w].

    idx0[l, j] = r_l + j (precomputed densely in XLA), so each output bank
    is a handful of bank gathers + selects — microseconds for all lanes.
    """
    L = rows.shape[0]
    assert L % LB == 0
    grid = (L // LB,)
    return pl.pallas_call(
        _shift_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((L, SW), jnp.int32),
        in_specs=[
            pl.BlockSpec((LB, rows.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB, SW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_params(),
        interpret=_interpret(),
    )(rows, idx0)


# ---------------------------------------------------------------------------
# stage 2: lock-step token decode

def _tab_gather(tab, idx):
    """Shared-table lookup: tab (8, 512) sublane-replicated, idx (8, G)
    lane-grid indices in [0, 512).  4 bank gathers + selects."""
    lob = idx & 127
    hib = idx >> 7
    out = jnp.zeros_like(idx)
    for b in range(TABLE // 128):
        bank = jnp.broadcast_to(tab[:, b * 128 : (b + 1) * 128],
                                (idx.shape[0], 128))
        g = jnp.take_along_axis(bank, lob, axis=1)
        out = jnp.where(hib == b, g, out)
    return out


def _list_select(cands, p):
    """Log-tree select of cands[p] per lane over a list of lane-grid
    vregs; len(cands)-1 vreg selects total (the per-lane stream refill
    has no gather-friendly layout on this hardware — dynamic_gather only
    runs along the minor axis of a shape-matched 2D operand)."""
    def pow2_tree(cands, p):
        bit = 0
        while len(cands) > 1:
            take_hi = (p & (1 << bit)) != 0
            cands = [jnp.where(take_hi, hi, lo)
                     for lo, hi in zip(cands[0::2], cands[1::2])]
            bit += 1
        return cands[0]

    def sel(lo, n, p):
        if n == 1:
            return cands[lo]
        n2 = 1 << (n.bit_length() - 1)
        if n2 == n:
            return pow2_tree([cands[lo + w] for w in range(n)], p)
        a = pow2_tree([cands[lo + w] for w in range(n2)], p)
        b = sel(lo + n2, n - n2, p - n2)
        return jnp.where(p < n2, a, b)

    return sel(0, len(cands), p)


def _plane_select(planes, p):
    """Per-lane word fetch from (SW, 8, G) lane-grid word-planes."""
    return _list_select([planes[w] for w in range(planes.shape[0])], p)


def _plane_pair_select(planes, q):
    """Per-lane fetch of the word PAIR (2q, 2q+1): two SW/2-1-select trees
    sharing one index vreg — half the per-word select cost of two
    _plane_select calls, the decode loop's refill win (round-4 paired
    refill: insert 64 bits every two tokens, so the refill cursor stays
    pair-aligned and only SW/2 positions are addressable)."""
    SW = planes.shape[0]
    lo = _list_select([planes[2 * w] for w in range(SW // 2)], q)
    hi = _list_select([planes[2 * w + 1] for w in range(SW // 2)], q)
    return lo, hi


def _shl(x, s):
    """x << s for s in [0, 32), uint32."""
    return x << s


def _shl32m(x, s):
    """x << (32 - s) for s in [0, 32), yields 0 at s == 0."""
    return (x << (jnp.uint32(31) - s)) << 1


def _shr32m(x, s):
    """x >> (32 - s) for s in [0, 32), yields 0 at s == 0."""
    return (x >> (jnp.uint32(31) - s)) >> 1


def _decode_kernel(lt_ref, dt_ref, planes_ref, bit0_ref, endb_ref,
                   tok_ref, meta_ref, *, T: int):
    """Paired-refill lock-step decode: TWO tokens per loop iteration, ONE
    64-bit (word-pair) refill per iteration.

    The buffer is 128 bits (b0..b3).  split_far caps every coded token at
    32 bits, so a token pair consumes <= 64 bits — exactly the refill
    rate — and the word cursor stays pair-aligned, so the refill select
    runs over SW/2 pair positions (two 47-select trees sharing one index
    vreg) instead of one 95-select tree per token: half the refill cost,
    which round-3 profiling put at ~60% of the decode loop.

    Invariant: nbits >= 65 at each pair start (init 128 - (bit0 & 31) >=
    97; consume <= 64; refill +64 whenever nbits <= 64), so both tokens
    always see >= 33 valid buffer bits.  Corrupt streams can break the
    <=32-bit token contract and drain the buffer — they then decode
    garbage that the endb / error-flag meta checks reject (all shift
    amounts are clamped, so execution stays defined)."""
    SW = planes_ref.shape[0]
    planes = planes_ref[:]
    lt = lt_ref[:]
    dt = dt_ref[:]
    bit0 = bit0_ref[:]      # (8, G) lane-grid, values in [0, 32)
    endb = endb_ref[:]
    T2 = (T + 1) // 2

    # --- initial fill: lanes start inside word 0 (bit0 < 32), so the
    # first four words are static plane reads — no select tree
    s0 = (bit0 & 31).astype(jnp.uint32)
    w = [planes[i].astype(jnp.uint32) for i in range(4)]
    b0 = (w[0] >> s0) | _shl32m(w[1], s0)
    b1 = (w[1] >> s0) | _shl32m(w[2], s0)
    b2 = (w[2] >> s0) | _shl32m(w[3], s0)
    b3 = w[3] >> s0
    nbits0 = (jnp.int32(128) - (bit0 & 31)).astype(jnp.int32)

    def one_token(b, bitpos, active, err, count):
        b0, b1, b2, b3 = b
        # --- litlen symbol
        e = _tab_gather(lt, (b0 & (TABLE - 1)).astype(jnp.int32))
        ln = e & 15
        kind = (e >> 4) & 3
        eb = (e >> 6) & 7
        base = (e >> 9) & 511
        lnu = ln.astype(jnp.uint32)
        extra = ((b0 >> lnu) & ((jnp.uint32(1) << eb.astype(jnp.uint32)) - 1)
                 ).astype(jnp.int32)
        val = jnp.where(kind == _KIND_LEN, base + extra, base)
        k1 = (ln + eb).astype(jnp.uint32)  # 1..14 (0 only for invalid codes)
        b0 = (b0 >> k1) | _shl32m(b1, k1)
        b1 = (b1 >> k1) | _shl32m(b2, k1)
        b2 = (b2 >> k1) | _shl32m(b3, k1)
        b3 = b3 >> k1
        # --- distance symbol (result masked out for literals/EOB)
        de = _tab_gather(dt, (b0 & (TABLE - 1)).astype(jnp.int32))
        dln = de & 15
        deb = (de >> 4) & 15
        dbase = (de >> 8) & 0x7FFF
        dlnu = dln.astype(jnp.uint32)
        dex = ((b0 >> dlnu) & ((jnp.uint32(1) << deb.astype(jnp.uint32)) - 1)
               ).astype(jnp.int32)
        dist = dbase + dex
        is_len = kind == _KIND_LEN
        is_eob = kind == _KIND_EOB
        k2 = jnp.where(is_len, dln + deb, 0).astype(jnp.uint32)  # 0..19
        b0 = (b0 >> k2) | _shl32m(b1, k2)
        b1 = (b1 >> k2) | _shl32m(b2, k2)
        b2 = (b2 >> k2) | _shl32m(b3, k2)
        b3 = b3 >> k2
        k = (k1 + k2).astype(jnp.int32)
        newpos = bitpos + jnp.where(active, k, 0)
        bad = ((ln == 0) | (kind == _KIND_INVALID)
               | (is_len & ((dln == 0) | (dist > TOK_DIST_MASK)))
               | (newpos > endb))
        emit = active & ~bad & ~is_eob
        tok = jnp.where(
            is_len, val | (dist << TOK_DIST_SHIFT) | TOK_MATCH_BIT, val)
        tok = jnp.where(emit, tok, 0)
        count = count + emit.astype(jnp.int32)
        err = err | (active & bad)
        bitpos = jnp.where(active & ~bad, newpos, bitpos)
        active = active & ~bad & ~is_eob & (newpos < endb)
        return (b0, b1, b2, b3), k, tok, bitpos, active, err, count

    def cond(state):
        t, *_rest, active_i, _err, _cnt = state
        return (t < T2) & (jnp.max(active_i) > 0)

    def body(state):
        (t, bitpos, q, b0, b1, b2, b3, nbits, active_i, err_i, count) = state
        active = active_i > 0
        err = err_i > 0
        b, kA, tokA, bitpos, active, err, count = one_token(
            (b0, b1, b2, b3), bitpos, active, err, count)
        b, kB, tokB, bitpos, active, err, count = one_token(
            b, bitpos, active, err, count)
        b0, b1, b2, b3 = b
        tok_ref[pl.ds(t * 2, 1)] = tokA[None]
        tok_ref[pl.ds(t * 2 + 1, 1)] = tokB[None]
        nbits = nbits - kA - kB
        # --- paired refill: insert words (2q, 2q+1) at bit offset nbits
        need = nbits <= 64
        qc = jnp.minimum(jnp.where(need, q, 0), SW // 2 - 1)
        wlo, whi = _plane_pair_select(planes, qc)
        wlo = wlo.astype(jnp.uint32)
        whi = whi.astype(jnp.uint32)
        s = jnp.clip(nbits, 0, 64)
        s31 = (s & 31).astype(jnp.uint32)
        j0 = s < 32
        j1 = (s >= 32) & (s < 64)
        j2 = s >= 64
        t0 = _shl(wlo, s31)
        t1 = _shr32m(wlo, s31) | _shl(whi, s31)
        t2 = _shr32m(whi, s31)
        zero = jnp.zeros_like(t0)
        b0 = jnp.where(need & j0, b0 | t0, b0)
        b1 = jnp.where(need, b1 | jnp.where(j0, t1, jnp.where(j1, t0, zero)),
                       b1)
        b2 = jnp.where(need, b2 | jnp.where(j0, t2, jnp.where(j1, t1, t0)),
                       b2)
        b3 = jnp.where(need & ~j0, b3 | jnp.where(j1, t2, t1), b3)
        q = q + need.astype(jnp.int32)
        nbits = nbits + jnp.where(need, 64, 0)
        return (t + 1, bitpos, q, b0, b1, b2, b3, nbits,
                active.astype(jnp.int32), err.astype(jnp.int32), count)

    G = bit0.shape
    active0 = (bit0 < endb).astype(jnp.int32)
    zero = jnp.zeros(G, jnp.int32)
    state = (jnp.int32(0), bit0, jnp.full(G, 2, jnp.int32), b0, b1, b2, b3,
             nbits0, active0, zero, zero)
    (t, bitpos, _q, _b0, _b1, _b2, _b3, _nb, active_i, err_i, count
     ) = jax.lax.while_loop(cond, body, state)
    meta_ref[0] = count
    meta_ref[1] = bitpos
    meta_ref[2] = err_i
    meta_ref[3] = active_i


@partial(jax.jit, static_argnames=("T", "LB"))
def decode_turbo(planes: jax.Array,  # (SW, 8, L//8) int32 word-planes
                 bit0: jax.Array,    # (8, L//8) int32 lane-grid bit offsets
                 endb: jax.Array,    # (8, L//8) int32 lane-grid end bits
                 lt: jax.Array,      # (8, 512) int32
                 dt: jax.Array,      # (8, 512) int32
                 T: int = MAX_TOKENS,
                 LB: int = LANE_BLOCK):
    """Lock-step decode; one symbol per lane per iteration.

    Lane-grid layout: lane l of grid step i sits at [.., l // (LB//8),
    i*(LB//8) + l % (LB//8)] of every (…, 8, L//8) array.

    Returns (tokens (T, 8, L//8) int32 packed, meta (4, 8, L//8) int32):
    meta planes: 0 token count, 1 end bit position, 2 error flag,
    3 still-active-after-T flag (also an error).
    """
    # the paired loop writes token rows 2t and 2t+1 for t < (T+1)//2, so an
    # odd T would write row T out of bounds (ADVICE r4)
    assert T % 2 == 0, "decode_turbo requires an even token capacity T"
    SW, _, G = planes.shape
    L = G * 8
    assert L % LB == 0
    GB = LB // 8
    grid = (L // LB,)
    return pl.pallas_call(
        partial(_decode_kernel, T=T),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((T, 8, G), jnp.int32),
                   jax.ShapeDtypeStruct((4, 8, G), jnp.int32)),
        in_specs=[
            pl.BlockSpec((8, TABLE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TABLE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SW, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(lt, dt, planes, bit0, endb)


# ---------------------------------------------------------------------------
# stage 3: tile-sequential LZ resolve over 4 KiB chunk rows

def _pgather(tab, idx, nbanks):
    """Per-row gather from (R, nbanks*128) via shape-matched vreg gathers."""
    lob = idx & 127
    hib = idx >> 7
    out = jnp.zeros_like(idx)
    for b in range(nbanks):
        g = jnp.take_along_axis(tab[:, b * 128 : (b + 1) * 128], lob, axis=1)
        out = jnp.where(hib == b, g, out)
    return out


def _resolve_kernel(toks_ref, starts_ref, out_ref, scratch_ref):
    CB = out_ref.shape[0]
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (CB, 128), 1)
    nb_tok = TOKENS_PAD // 128
    tiles_per_sub = SUB // 128

    for m in range(SUBS_PER_CHUNK):  # sub-lane within the chunk
        toks_m = toks_ref[m]      # (CB, TOKENS_PAD)
        starts_m = starts_ref[m]
        ktok = jnp.zeros((CB, 128), jnp.int32)  # broadcast cursor
        for j in range(tiles_per_sub):  # 128-byte tile within the sub-span
            t = m * tiles_per_sub + j
            qbase = t * 128
            q_local = j * 128 + iota128          # within the SUB-byte span
            idxw = jnp.minimum(ktok + iota128, TOKENS_PAD - 1)
            toks_f = _pgather(toks_m, idxw, nb_tok)
            starts_f = _pgather(starts_m, idxw, nb_tok)
            # covering token per byte: bisection over the sorted window
            lo = jnp.zeros((CB, 128), jnp.int32)
            step = 64
            while step:
                mid = lo + step
                sv = jnp.take_along_axis(starts_f, mid, axis=1)
                lo = jnp.where(sv <= q_local, mid, lo)
                step //= 2
            tid = lo
            tok_b = jnp.take_along_axis(toks_f, tid, axis=1)
            st_b = jnp.take_along_axis(starts_f, tid, axis=1)
            val = tok_b & TOK_VAL_MASK
            dist = (tok_b >> TOK_DIST_SHIFT) & TOK_DIST_MASK
            ism = (tok_b & TOK_MATCH_BIT) != 0
            q_chunk = qbase + iota128            # within the 4 KiB chunk
            srcq = jnp.clip(q_chunk - dist, 0, 4095)
            # phase A: sources in already-resolved tiles (final bytes)
            vA = jnp.zeros((CB, 128), jnp.int32)
            if t:
                s_lo = srcq & 127
                s_hi = srcq >> 7
                for b in range(t):
                    g = jnp.take_along_axis(
                        scratch_ref[:, b * 128 : (b + 1) * 128], s_lo, axis=1)
                    vA = jnp.where(s_hi == b, g, vA)
            # phase B: in-tile overlaps via pointer doubling
            FLAG = jnp.int32(1) << 30
            from_res = srcq < qbase
            state = jnp.where(
                ism,
                jnp.where(from_res, (vA & 255) | FLAG, q_chunk - dist - qbase),
                (val & 255) | FLAG)
            for _ in range(7):
                ptr = state & 127
                s2 = jnp.take_along_axis(state, ptr, axis=1)
                state = jnp.where(state >= FLAG, state, s2)
            vals = state & 255
            scratch_ref[:, qbase : qbase + 128] = vals
            out_ref[:, qbase : qbase + 128] = vals.astype(jnp.uint8)
            # advance the token cursor to the next tile's covering token
            tid_l = tid[:, 127:128]
            end_l = st_b[:, 127:128] + jnp.where(
                ism[:, 127:128], val[:, 127:128], 1)
            done = (end_l <= (j * 128 + 128)).astype(jnp.int32)
            ktok = ktok + tid_l + done


@partial(jax.jit, static_argnames=("CB",))
def resolve_turbo(toks: jax.Array,    # (SUBS_PER_CHUNK, C, TOKENS_PAD) int32
                  starts: jax.Array,  # same shape, start offsets in-sub-span
                  CB: int = CHUNK_BLOCK):
    """Expand per-sub-lane token streams into 4 KiB chunk rows.

    starts are per-token output offsets within the owning SUB-byte sub-lane
    span (0..SUB-1); padded/invalid slots must carry start 2048; the odd
    sub-spans' slot 0 holds the mid-segment crossing token with a negative
    start (or a never-selected (-SUB, literal 0) sentinel).
    ``CB`` = chunk rows per kernel invocation (clamped to divide C; smaller
    values let per-device shards of a mesh-sharded inflate stay under the
    grid-divisibility constraint).  Returns (C, 4096) uint8.
    """
    _, Cp, TP = toks.shape
    while Cp % CB:
        CB //= 2
    assert TP == TOKENS_PAD and Cp % CB == 0
    grid = (Cp // CB,)
    spec = pl.BlockSpec((SUBS_PER_CHUNK, CB, TOKENS_PAD),
                        lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _resolve_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Cp, 4096), jnp.uint8),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((CB, 4096), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CB, 4096), jnp.int32)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(toks, starts)


# ---------------------------------------------------------------------------
# encode-side: lock-step greedy/lazy token selection (turbo profile)
#
# The XLA select_tokens while_loop pays ~10 ns per per-lane gather per
# iteration (3 gathers x thousands of lanes x 512 iterations); here each
# lane's segment lives in word-planes and the cursor walk is pure vreg work.

# packed per-position plane value: dist(12) | len(9 @12) | literal(8 @21)
SEL_LEN_SHIFT = 12
SEL_LIT_SHIFT = 21


def _select_kernel(planes_ref, seglen_ref, tok_ref, meta_ref, *, lazy: bool,
                   split_far: bool):
    SEG = planes_ref.shape[0]
    planes = planes_ref[:]
    seg_end = seglen_ref[:]          # (8, G) valid positions in segment
    G = seg_end.shape

    def nxt_plane(w):
        return planes[min(w + 1, SEG - 1)]

    def cond(state):
        t, _c, active_i, _cnt = state
        return (t < SEG) & (jnp.max(active_i) > 0)

    def body(state):
        t, c, active_i, count = state
        active = active_i > 0
        cs = jnp.minimum(c, SEG - 1)
        cur = _plane_select(planes, cs)
        ml = (cur >> SEL_LEN_SHIFT) & 511
        dist = cur & 0xFFF
        lit = (cur >> SEL_LIT_SHIFT) & 0xFF
        ml = jnp.minimum(ml, seg_end - c)
        if split_far:
            ml = jnp.where((ml >= 131) & (dist >= 2049), 130, ml)
        use = ml >= 3
        if lazy:
            nxt = _plane_select(planes, jnp.minimum(cs + 1, SEG - 1))
            ml1 = (nxt >> SEL_LEN_SHIFT) & 511
            defer = (use & (ml < 258) & (ml1 > ml) & (c + 1 < seg_end))
            use = use & ~defer
        tok = jnp.where(use,
                        ml | (dist << TOK_DIST_SHIFT) | TOK_MATCH_BIT, lit)
        emit = active
        tok = jnp.where(emit, tok, 0)
        tok_ref[pl.ds(t, 1)] = tok[None]
        count = count + emit.astype(jnp.int32)
        adv = jnp.where(use, ml, 1)
        c = jnp.where(active, c + adv, c)
        active = active & (c < seg_end)
        return (t + 1, c, active.astype(jnp.int32), count)

    active0 = (seg_end > 0).astype(jnp.int32)
    zero = jnp.zeros(G, jnp.int32)
    state = (jnp.int32(0), zero, active0, zero)
    _t, _c, _a, count = jax.lax.while_loop(cond, body, state)
    meta_ref[0] = count


@partial(jax.jit, static_argnames=("lazy", "split_far", "LB"))
def select_turbo(planes: jax.Array,   # (SEG, 8, L//8) packed positions
                 seg_len: jax.Array,  # (8, L//8) valid bytes per segment
                 lazy: bool = True,
                 split_far: bool = True,
                 LB: int = LANE_BLOCK):
    """Greedy(+lazy) tokenization, one position-or-match per iteration.

    Returns (tokens (SEG, 8, L//8) int32 in the turbo token packing,
    counts (1, 8, L//8) int32).  Turbo-profile only: distances must fit
    12 bits (guaranteed by the 4 KiB window reset).
    """
    SEG, _, G = planes.shape
    L = G * 8
    assert L % LB == 0
    GB = LB // 8
    grid = (L // LB,)
    return pl.pallas_call(
        partial(_select_kernel, lazy=lazy, split_far=split_far),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((SEG, 8, G), jnp.int32),
                   jax.ShapeDtypeStruct((1, 8, G), jnp.int32)),
        in_specs=[
            pl.BlockSpec((SEG, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SEG, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, GB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(planes, seg_len)
