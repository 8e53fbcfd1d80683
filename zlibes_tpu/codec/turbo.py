"""Turbo inflate pipeline: anchor-lane extraction + Pallas lock-step decode
+ chunk-row LZ resolve, for streams carrying the turbo profile
(CodecConfig.turbo(): shared 9-bit-capped tables, 512 B anchors, 4 KiB
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

SUB = tk.SUB


def _bucket(n: int, lo: int) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


@partial(jax.jit, static_argnames=("T", "C_pad", "LB"))
def _glue_tokens(tokens_g: jax.Array,  # (T, 8, G) int32 decode-grid tokens
                 counts_g: jax.Array,  # (8, G) int32 decode-grid counts
                 base_g: jax.Array,    # (8, G) int32 per-lane sub-span
                                       # offset of the first token (0 for
                                       # even lanes; split-256 for odd)
                 T: int, C_pad: int, LB: int = tk.LANE_BLOCK):
    """Token post-pass: start offsets + paired resolve-layout reshape.

    Decode lanes come in pairs covering one SEG_SPAN-byte selection
    segment, split at the first token starting at-or-after byte SUB.
    Lane 2s feeds resolve sub-span 2s directly (all its tokens start in
    [0, SUB)); lane 2s+1 feeds sub-span 2s+1 with starts rebased by -SUB,
    prefixed by the *crossing token* — the even lane's token that straddles
    the SUB boundary, re-emitted with a negative start so the resolve
    bisection finds it for the odd sub-span's first bytes.  The slot is
    inserted ONLY when a token actually crosses: a crossing token covers
    ≥ 1 byte of the sub-span, keeping every 128-byte resolve tile's
    covering tokens within one 128-slot bisection window (a dead slot 0
    would push an all-literal tile's cover to 129 slots).

    Everything data-sized computes in the decode-grid layout (cumsum and
    reductions along the token axis), so each big array pays exactly ONE
    transpose — straight from the decode grid to the resolve rows.

    Returns (toks16, starts16): (SUBS_PER_CHUNK, C_pad, TOKENS_PAD) int32
    with invalid slots carrying start 2048 (past any in-span position).
    """
    _, E, G = tokens_g.shape
    L = E * G
    NL = L // LB
    GB = LB // 8
    spc = tk.SUBS_PER_CHUNK
    assert GB % spc == 0

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, E, G), 0)
    valid = iota_t < counts_g[None]
    ism = (tokens_g & tk.TOK_MATCH_BIT) != 0
    val = tokens_g & tk.TOK_VAL_MASK
    lens = jnp.where(valid, jnp.where(ism, val, 1), 0)
    ends = jnp.cumsum(lens, axis=0)
    starts = jnp.where(valid, base_g[None] + ends - lens, 2048)
    toks = jnp.where(valid, tokens_g, 0)

    # crossing token per lane (at most one; only even lanes can trigger:
    # odd lanes' rebased tokens end at <= SUB); sum = select
    cross = valid & (starts < tk.SUB) & (starts + lens > tk.SUB)
    has_cross = jnp.any(cross, axis=0)                         # (8, G)
    cross_t = jnp.sum(jnp.where(cross, toks, 0), axis=0)
    cross_s = jnp.sum(jnp.where(cross, starts, 0), axis=0) - tk.SUB

    # small per-lane arrays to lane order; odd rows prepend the PREVIOUS
    # (even) lane's crossing token — a one-lane shift, no strided slicing.
    # The decode-lane sort moves whole 4 KiB CHUNKS (16 lanes), so lane
    # adjacency inside every chunk — all this pass relies on — is
    # preserved; only the final resolve rows need un-permuting (run_turbo
    # applies plan.chunk_inv to the (C_pad, 4096) output).
    def lane_vec(v):  # (8, G) grid -> (L,) lane-ordered
        return jnp.transpose(v.reshape(8, NL, GB), (1, 0, 2)).reshape(L)

    use0 = jnp.pad(lane_vec(has_cross), (1, 0))[:L] \
        & ((jnp.arange(L, dtype=jnp.int32) & 1) == 1)
    slot0_t = jnp.pad(lane_vec(cross_t), (1, 0))[:L]
    slot0_s = jnp.pad(lane_vec(cross_s), (1, 0))[:L]
    u3 = use0.reshape(C_pad, spc).T[:, :, None]
    pe = tk.TOKENS_PAD - T

    def relayout(x, slot0, fill):
        # one transpose: (T, 8, NL, GB/spc, spc) -> (spc, chunk dims, T);
        # lane l = i*LB + r*GB + c sits at chunk l//spc, sub-span l%spc
        x = x.reshape(T, 8, NL, GB // spc, spc)
        rows = jnp.transpose(x, (4, 2, 1, 3, 0)).reshape(spc, C_pad, T)
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pe)),
                       constant_values=fill)
        s3 = slot0.reshape(C_pad, spc).T[:, :, None]
        shifted = jnp.concatenate([s3, rows[:, :, :-1]], axis=2)
        return jnp.where(u3, shifted, rows)
    return relayout(toks, slot0_t, 0), relayout(starts, slot0_s, 2048)


def _lane_spans(index: StreamIndex):
    """Per-anchor (bit0, end_bit) absolute spans; turbo anchors come in
    pairs per SEG_SPAN bytes of output (segment start + mid-segment
    split)."""
    na = index.anchor_bit.size
    bit0 = index.anchor_bit.astype(np.int64)
    blk = index.anchor_block.astype(np.int64)
    end = np.empty(na, np.int64)
    end[:-1] = bit0[1:]
    blk_end = np.asarray([b.end_bit for b in index.blocks], np.int64)
    last_of_block = np.ones(na, bool)
    last_of_block[:-1] = blk[1:] != blk[:-1]
    end[last_of_block] = blk_end[blk[last_of_block]]
    return bit0, end


def _lane_grid(arr: np.ndarray, L_pad: int, LB: int) -> np.ndarray:
    """(L,) per-lane values -> (8, L_pad//8) lane-grid matching the decode
    kernel's per-grid-step (8, LB//8) blocks (lane l of step i sits at
    row l // (LB//8), column i*(LB//8) + l % (LB//8))."""
    x = np.zeros(L_pad, arr.dtype)
    x[: arr.size] = arr
    return np.ascontiguousarray(
        x.reshape(L_pad // LB, 8, LB // 8).transpose(1, 0, 2)
    ).reshape(8, L_pad // 8)


@partial(jax.jit, static_argnames=("LB",))
def _to_planes(lanes: jax.Array, LB: int):
    """(L, SW) stream rows -> (SW, 8, L//8) lane-grid word-planes."""
    L, SW = lanes.shape
    GB = LB // 8
    x = lanes.reshape(L // LB, 8, GB, SW)
    return jnp.transpose(x, (3, 1, 0, 2)).reshape(SW, 8, L // 8)


@partial(jax.jit, static_argnames=("LB",))
def _from_grid(x: jax.Array, LB: int):
    """(..., 8, L//8) lane-grid -> (..., L) lane-ordered."""
    *lead, _, G = x.shape
    L = G * 8
    GB = LB // 8
    y = x.reshape(*lead, 8, L // LB, GB)
    order = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                       len(lead) + 2)
    return jnp.transpose(y, order).reshape(*lead, L)


class TurboPlan:
    """Host-prepared device arrays for one turbo stream (reusable)."""

    __slots__ = ("words", "starts_w", "shift_idx", "bit0", "endb", "lt", "dt",
                 "base_g", "chunk_inv", "L", "L_pad", "C_pad", "T", "LB",
                 "total_out", "lane_end_check")

    @staticmethod
    def build(data: bytes, index: StreamIndex,
              lane_block: int = tk.LANE_BLOCK,
              min_lanes: int = 0,
              sort_lanes: bool = True,
              sort_shards: int = 1) -> "TurboPlan":
        """``min_lanes`` pads the lane count further (power of two, multiple
        of ``lane_block``) so a mesh-sharded run can give every device a
        whole number of lane blocks.

        ``sort_lanes`` orders decode lanes by descending bit-span (a
        monotone proxy for token count): the decode kernel's lock-step
        loop runs each LANE_BLOCK grid block to its own max token count,
        so grouping similar-length lanes lets literal-light blocks exit
        after ~tens of iterations instead of the global max (~257).  The
        glue stage restores original order via ``plan.inv``.
        ``sort_shards`` > 1 sorts within L_pad/sort_shards-lane spans so a
        mesh-sharded run keeps every lane on its original device."""
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
        spans = L // 2
        seg = tk.SEG_SPAN
        base_rel = index.anchor_out - (np.arange(L, dtype=np.int64) // 2) * seg
        if (L % 2 or not np.array_equal(base_rel[0::2],
                                        np.zeros(spans, np.int64))
                or (base_rel[1::2] < 0).any()
                or (base_rel[1::2] > seg).any()):
            raise CorruptError(
                f"turbo anchors must pair every {seg} B of output with a "
                f"mid-segment split anchor (split < {tk.SUB} only for a "
                f"short final segment, where the second lane is empty)")
        # lanes start at a 128-word-aligned block (DMA extraction); the
        # word-granular residue is dropped by shift_lanes, the sub-word
        # bits live in bit0
        A = (bit0_abs >> 12).astype(np.int32)
        resid = ((bit0_abs >> 5) & 127).astype(np.int32)
        bit0_in = (bit0_abs & 31).astype(np.int32)
        endb_in = (end_abs - ((bit0_abs >> 5) << 5)).astype(np.int32)
        if int(endb_in.max(initial=0)) > (tk.STREAM_WORDS - 4) * 32:
            raise CorruptError("anchor span exceeds the lane stream window")

        p = TurboPlan()
        p.L = L
        p.LB = lane_block
        p.L_pad = max(_bucket(L, lane_block), min_lanes)
        p.C_pad = p.L_pad // tk.SUBS_PER_CHUNK
        p.total_out = index.total_out
        p.T = tk.MAX_TOKENS

        raw = np.frombuffer(data, np.uint8)
        npad = (-raw.size) % 512 + 4 * (tk.FETCH_WORDS + 128)
        words = np.concatenate([raw, np.zeros(npad, np.uint8)]).view("<u4")
        nb = _bucket(-(-words.size // 128), 32)
        blocks = np.zeros((nb, 128), np.int32)
        blocks.reshape(-1)[: words.size] = words.view(np.int32)
        p.words = jnp.asarray(blocks)

        # full-width per-lane host arrays (padded lanes: empty spans)
        def full(vals, dtype=np.int32):
            x = np.zeros(p.L_pad, dtype)
            x[:L] = vals
            return x

        sw = full(A)
        rs = full(resid)
        b0 = full(bit0_in)
        eb = full(endb_in)
        # per-lane first-token offset in SUB-span coordinates (odd lanes'
        # within-segment split offset is rebased by -SUB here, once)
        br = full(base_rel.astype(np.int32))
        br[1::2] -= tk.SUB
        br[1::2] = np.maximum(br[1::2], 0)  # short final / padded lanes
        br[L:] = 0

        # decode-lane sort (see build docstring): whole 4 KiB CHUNKS
        # (16 paired lanes) ordered by their tallest lane's bit-span, so
        # similar-cost lanes share Pallas grid blocks and literal-light
        # blocks exit early; chunk granularity keeps the glue's intra-
        # chunk lane adjacency intact, and only the (C_pad, 4096) resolve
        # OUTPUT rows need un-permuting — a 4 KB-row gather (~free),
        # where a lane-granular inverse permutation of the token arrays
        # cost more than the sort saved (round-4 profile: 3.7 ms).
        spc = tk.SUBS_PER_CHUNK
        span = full((end_abs - bit0_abs).astype(np.int32))
        ckey = span.reshape(p.C_pad, spc).max(axis=1)
        if sort_lanes:
            assert p.C_pad % sort_shards == 0
            csz = p.C_pad // sort_shards
            chunk_perm = np.concatenate([
                np.argsort(-ckey[s : s + csz], kind="stable") + s
                for s in range(0, p.C_pad, csz)])
        else:
            chunk_perm = np.arange(p.C_pad)
        perm = (chunk_perm[:, None] * spc
                + np.arange(spc)[None, :]).reshape(-1)
        chunk_inv = np.argsort(chunk_perm, kind="stable")
        chunk_inv_local = (chunk_inv
                           - (np.arange(p.C_pad) // (p.C_pad // sort_shards))
                           * (p.C_pad // sort_shards)).astype(np.int32)
        p.chunk_inv = jnp.asarray(chunk_inv_local)

        p.starts_w = jnp.asarray(sw[perm])
        p.shift_idx = jnp.asarray(rs[perm][:, None]
                                  + np.arange(128, dtype=np.int32)[None, :])
        p.bit0 = jnp.asarray(_lane_grid(b0[perm], p.L_pad, lane_block))
        p.endb = jnp.asarray(_lane_grid(eb[perm], p.L_pad, lane_block))
        p.lane_end_check = eb[perm]
        p.base_g = jnp.asarray(_lane_grid(br[perm], p.L_pad, lane_block))
        p.lt = jnp.asarray(lt)
        p.dt = jnp.asarray(dt)
        return p

    def check_meta(self, meta: np.ndarray) -> None:
        """Validate decode metadata (lane-grid column layout -> lane order
        matches token columns: decoded lane i is column i of the (8, L_pad)
        meta; padded/empty lanes must end where they start — 0 == 0)."""
        Lp = self.L_pad
        if meta[2, :Lp].any() or meta[3, :Lp].any():
            raise CorruptError("invalid Huffman data in turbo lane")
        if not (meta[1, :Lp] == self.lane_end_check).all():
            raise CorruptError("turbo lane did not end at its anchor")


def run_turbo(plan: TurboPlan, check: bool = True):
    """Execute the three device stages; returns the (C_pad, 4096) uint8
    chunk rows (device-resident) — output bytes are rows flattened and cut
    at plan.total_out."""
    fetched = tk.extract_lanes(plan.words, plan.starts_w)
    lanes = tk.shift_lanes(fetched, plan.shift_idx, LB=plan.LB)
    planes = _to_planes(lanes, LB=plan.LB)
    tokens_g, meta_g = tk.decode_turbo(planes, plan.bit0, plan.endb,
                                       plan.lt, plan.dt, T=plan.T,
                                       LB=plan.LB)
    if check:
        plan.check_meta(np.asarray(_from_grid(meta_g, LB=plan.LB)))
    toks16, starts16 = _glue_tokens(tokens_g, meta_g[0], plan.base_g,
                                    T=plan.T, C_pad=plan.C_pad, LB=plan.LB)
    rows = tk.resolve_turbo(toks16, starts16)
    # chunks were decoded in sorted order; one 4 KB-row gather restores it
    return jnp.take(rows, plan.chunk_inv, axis=0)


def inflate_raw_turbo(data: bytes, index: StreamIndex,
                      check: bool = True) -> np.ndarray:
    """Full turbo inflate of a stream produced by CodecConfig.turbo().

    Returns the decompressed bytes as a host uint8 array.
    """
    plan = TurboPlan.build(data, index)
    rows = run_turbo(plan, check=check)
    flat = rows.reshape(-1)[: plan.total_out]
    return np.asarray(flat)
