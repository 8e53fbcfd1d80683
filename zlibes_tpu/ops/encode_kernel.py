"""Pallas encode-side field kernel: token → (coded bits, bit count).

Reference analog: the per-symbol table lookups + bit emission of the
encode loop at src/deflate.ts:183-226.  The XLA implementation served
symbol→(code,len) lookups with (tokens × alphabet) one-hot matmuls —
exact, but ~600 B of HBM traffic per token.  For shared-table (turbo)
streams the tables are identical for every block, so the lookup collapses
to the same banked vreg-gather pattern the decode kernel uses
(tpu.dynamic_gather on sublane-replicated table tiles): ~20 B of traffic
per token, two orders of magnitude less.

The kernel is pointwise per token — no lock-step loop — so it runs at
VPU speed over (rows, 128) tiles of the flattened token arrays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .symbol_math import dist_symbol, len_symbol
from .turbo_kernel import _interpret, _params

# litlen table width (288 symbols padded to 3 gather banks)
LL_PAD = 384
# dist table width (32 symbols padded to 1 gather bank)
D_PAD = 128
# token rows (of 128) per grid step
ENC_BL = 256


def _gather_banks(tab, idx, nbanks):
    """tab (BL, nbanks*128) row-replicated, idx (BL, 128) → (BL, 128)."""
    lob = idx & 127
    hib = idx >> 7
    out = jnp.zeros_like(idx)
    for b in range(nbanks):
        g = jnp.take_along_axis(tab[:, b * 128 : (b + 1) * 128], lob, axis=1)
        out = jnp.where(hib == b, g, out)
    return out


def _shl(v, s):
    """v << s for s in [0, 32), uint32 in/out."""
    return v << s


def _encfields_kernel(lt_ref, dt_ref, tv_ref, td_ref, en_ref,
                      val_ref, nb_ref):
    tv = tv_ref[:]
    td = td_ref[:]
    en = en_ref[:] > 0
    ism = en & (td > 0)

    lsym = jnp.where(ism, len_symbol(jnp.clip(tv, 3, 258)),
                     jnp.clip(tv, 0, 287))
    dsym = jnp.where(ism, dist_symbol(jnp.clip(td, 1, 32768)), 0)

    e1 = _gather_banks(lt_ref[:], lsym, LL_PAD // 128)
    code1 = (e1 & 0x7FFF).astype(jnp.uint32)
    n1 = jnp.where(en, (e1 >> 16) & 31, 0)

    # length extra bits (arithmetic; symbol_math.len_extra inlined on u32)
    m = jnp.clip(tv - 3, 0, 255)
    blm = jnp.zeros_like(m)
    for k in range(1, 9):
        blm = blm + (m >= (1 << k)).astype(jnp.int32)
    blm = blm + 1
    e = jnp.where(m < 8, 0, jnp.maximum(blm - 3, 0))
    base_m = jnp.where(m < 8, m, (4 + ((m >> e) & 3)) << e)
    len_en = jnp.where(ism & (tv < 258), e, 0)
    len_ev = jnp.where(ism & (tv < 258), m - base_m, 0).astype(jnp.uint32)

    e3 = _gather_banks(dt_ref[:], dsym, D_PAD // 128)
    code3 = jnp.where(ism, (e3 & 0x7FFF), 0).astype(jnp.uint32)
    n3 = jnp.where(ism, (e3 >> 16) & 31, 0)

    # distance extra bits
    d1 = jnp.maximum(td, 1) - 1
    bld = jnp.zeros_like(d1)
    for k in range(1, 16):
        bld = bld + (d1 >= (1 << k)).astype(jnp.int32)
    bld = bld + 1
    kd = jnp.where(td <= 4, 0, jnp.maximum(bld - 2, 0))
    base_d = jnp.where(td <= 4, d1, (2 + ((d1 >> kd) & 1)) << kd)
    dist_en = jnp.where(ism, kd, 0)
    dist_ev = jnp.where(ism, d1 - base_d, 0).astype(jnp.uint32)

    # assemble the ≤32-bit combined field (LSB-first packing order:
    # litlen code, length extra, dist code, dist extra)
    n1u = n1.astype(jnp.uint32)
    n12 = n1 + len_en
    n12u = jnp.minimum(n12, 31).astype(jnp.uint32)
    n123 = n12 + n3
    n123u = jnp.minimum(n123, 31).astype(jnp.uint32)
    val = code1 | _shl(len_ev, n1u)
    val = val | jnp.where(n12 < 32, _shl(code3, n12u), 0)
    val = val | jnp.where(n123 < 32, _shl(dist_ev, n123u), 0)
    nb = n123 + dist_en

    val_ref[:] = val.astype(jnp.int32)
    nb_ref[:] = nb


@partial(jax.jit, static_argnames=())
def encode_fields(tv2: jax.Array,   # (NR, 128) int32 token values
                  td2: jax.Array,   # (NR, 128) int32 token dists
                  en2: jax.Array,   # (NR, 128) int32 validity mask
                  lt_pack: jax.Array,   # (ENC_BL, LL_PAD) int32 code|len<<16
                  dt_pack: jax.Array):  # (ENC_BL, D_PAD) int32
    """Coded (value, nbits) per token; rows are 128-token tiles."""
    NR = tv2.shape[0]
    BL = ENC_BL
    while NR % BL:  # small dispatches (sharded lanes): shrink the tile rows
        BL //= 2
    grid = (NR // BL,)
    tok_spec = pl.BlockSpec((BL, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _encfields_kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((NR, 128), jnp.int32),
                   jax.ShapeDtypeStruct((NR, 128), jnp.int32)),
        in_specs=[
            pl.BlockSpec((BL, LL_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BL, D_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tok_spec, tok_spec, tok_spec,
        ],
        out_specs=(tok_spec, tok_spec),
        compiler_params=_params(),
        interpret=_interpret(),
    )(lt_pack, dt_pack, tv2, td2, en2)


@jax.jit
def pack_tables(ll_code: jax.Array, ll_len: jax.Array,
                d_code: jax.Array, d_len: jax.Array):
    """(code, len) rows → sublane-replicated packed gather tables.

    Accepts the (B, 288)/(B, 32) per-block arrays the pack kernels already
    receive; shared-table streams have identical rows, so row 0 is the
    table (asserted by the caller's profile contract, not here).
    """
    lt = (ll_code[0].astype(jnp.int32) | (ll_len[0] << 16))
    dt = (d_code[0].astype(jnp.int32) | (d_len[0] << 16))
    lt = jnp.pad(lt, (0, LL_PAD - lt.shape[0]))
    dt = jnp.pad(dt, (0, D_PAD - dt.shape[0]))
    return (jnp.broadcast_to(lt[None, :], (ENC_BL, LL_PAD)),
            jnp.broadcast_to(dt[None, :], (ENC_BL, D_PAD)))
