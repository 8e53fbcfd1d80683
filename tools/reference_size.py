"""Behaviorally-exact Python model of the reference encoder (zlib.es) —
used ONCE to pin the reference's deflate output size on the shipped corpus
(BASELINE.md "size <= reference" bar), since this environment has no JS
runtime to execute the TypeScript directly.

This is a reimplementation of the documented algorithm, not a port for
production use: every deterministic quirk of the reference is reproduced
so the output size (and bytes) match what zlib.es itself would emit:

  * greedy LZ77 with an exact 3-byte index, newest-first candidate scan,
    caps FAST_INDEX_CHECK_MAX=128 / MIN=16 / FAST_REPEAT_LENGTH=8
    (/root/reference/src/lz77.ts:7-9,65-93)
  * match accepted iff len >= 3 and nowIndex+len <= start+targetLen-3
    (/root/reference/src/lz77.ts:95); final two bytes always literal
  * merge-round length-limited Huffman: maxLength rounds of
    leaves+pairs, stable sort by count, drop-last-if-odd, code length =
    package membership count (/root/reference/src/huffman.ts:55-153)
  * code-length RLE with the reference's exact run-splitting
    (/root/reference/src/deflate.ts:99-139)
  * every block BTYPE=DYNAMIC, BFINAL on last, zero-pad at stream end
    (/root/reference/src/deflate.ts:14-39)

Validation: the emitted container must satisfy zlib.decompress(out) == data.

Usage: python tools/reference_size.py [path-to-raw] -> prints sizes.
"""
from __future__ import annotations

import sys
import time
import zlib

import numpy as np

BLOCK = 131072
LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
            51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
             4, 4, 4, 4, 5, 5, 5, 5, 0]
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
             385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
             16385, 24577]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
              9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
CODELEN_VALUES = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
                  14, 1, 15]


def lz77_codes(arr: np.ndarray, start: int, tlen: int):
    """generateLZ77Codes semantics (lz77.ts:24-119)."""
    n = arr.size
    end = start + tlen - 3
    a32 = arr.astype(np.int64)
    # per-block exact 3-byte index
    if end >= start:
        keys = (a32[start:end + 1] << 16) | (a32[start + 1:end + 2] << 8) \
            | a32[start + 2:end + 3]
    else:
        keys = np.zeros(0, np.int64)
    index_map: dict[int, list[int]] = {}
    for off, k in enumerate(keys.tolist()):
        index_map.setdefault(k, []).append(start + off)

    start_cursor: dict[int, int] = {}
    end_cursor: dict[int, int] = {}
    out = []
    now = start
    keys_list = keys.tolist()
    while now <= end:
        key = keys_list[now - start]
        idxs = index_map.get(key)
        if idxs is None or len(idxs) <= 1:
            out.append((int(arr[now]),))
            now += 1
            continue
        slide_base = now - 0x8000 if now > 0x8000 else 0
        best = 0
        best_idx = 0
        sc = start_cursor.get(key, 0)
        while sc < len(idxs) and idxs[sc] < slide_base:
            sc += 1
        start_cursor[key] = sc
        ec = end_cursor.get(key, 0)
        while ec < len(idxs) and idxs[ec] < now:
            ec += 1
        end_cursor[key] = ec
        checks = 0
        for i in range(ec - 1, sc - 1, -1):
            if checks >= 128 or (best >= 8 and checks >= 16):
                break
            checks += 1
            idx = idxs[i]
            # match length vs current best (key guarantees bytes 0..2)
            lim = min(259, n - now)
            m = arr[idx:idx + lim] != arr[now:now + lim]
            nz = np.nonzero(m)[0]
            ln = min(int(nz[0]) if nz.size else lim, 258)
            if ln > best:
                best = ln
                best_idx = idx
                if ln >= 258:
                    break
        if best >= 3 and now + best <= end:
            dist = now - best_idx
            lcode = 0
            for i, b in enumerate(LEN_BASE):
                if b > best:
                    break
                lcode = i
            dcode = 0
            for i, b in enumerate(DIST_BASE):
                if b > dist:
                    break
                dcode = i
            out.append((lcode, dcode, best, dist))
            now += best
        else:
            out.append((int(arr[now]),))
            now += 1
    out.append((int(arr[now]),))
    out.append((int(arr[now + 1]),))
    return out


def huffman_bitlens(values, max_length):
    """generateDeflateHuffmanTable semantics (huffman.ts:55-153) — returns
    {symbol: bitlen}."""
    counts: dict[int, int] = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    keys = sorted(counts.keys())
    if len(keys) == 1:
        return {keys[0]: 1}
    if not keys:
        return {}
    tmp: list[tuple[int, list[int]]] = []
    packages: list[tuple[int, list[int]]] = []
    for _ in range(max_length):
        packages = [(counts[k], [k]) for k in keys]
        i = 0
        while i + 2 <= len(tmp):
            packages.append((tmp[i][0] + tmp[i + 1][0],
                             tmp[i][1] + tmp[i + 1][1]))
            i += 2
        packages.sort(key=lambda p: p[0])  # stable, count only
        if len(packages) % 2:
            packages.pop()
        tmp = packages
    bitlens: dict[int, int] = {}
    for _cnt, syms in packages:
        for s in syms:
            bitlens[s] = bitlens.get(s, 0) + 1
    return bitlens


def canonical_codes(bitlens: dict[int, int]):
    groups: dict[int, list[int]] = {}
    for sym, l in bitlens.items():
        groups.setdefault(l, []).append(sym)
    code = 0
    table = {}
    for l in range(min(groups), max(groups) + 1):
        for sym in sorted(groups.get(l, [])):
            table[sym] = (code, l)
            code += 1
        code <<= 1
    return table


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_lsb(self, v, n):  # writeRange
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, v, n):  # writeRangeCoded: MSB-first
        for i in range(n - 1, -1, -1):
            self.write_lsb((v >> i) & 1, 1)

    def pad(self):
        if self.nbits:
            self.write_lsb(0, 8 - self.nbits)


def rle_codelens(codelens):
    """deflate.ts:99-139 exact run splitting."""
    codes, counts = [], []
    i = 0
    n = len(codelens)
    while i < n:
        cl = codelens[i]
        rep = 1
        while i + 1 < n and cl == codelens[i + 1]:
            rep += 1
            i += 1
            if cl == 0:
                if rep >= 138:
                    break
            else:
                if rep >= 6:
                    break
        if rep >= 4:
            if cl == 0:
                codes.append(18 if rep >= 11 else 17)
                counts.append(rep)
            else:
                codes.append(cl)
                counts.append(1)
                rep -= 1
                codes.append(16)
                counts.append(rep)
        else:
            for _ in range(rep):
                codes.append(cl)
                counts.append(1)
        i += 1
    return codes, counts


def deflate_reference(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    n = arr.size
    bw = BitWriter()
    pos = 0
    while True:
        if pos + BLOCK >= n:
            tlen = n - pos
            bw.write_lsb(1, 1)
        else:
            tlen = BLOCK
            bw.write_lsb(0, 1)
        bw.write_lsb(2, 2)
        toks = lz77_codes(arr, pos, tlen)
        cl_values = [256]
        d_values = []
        cl_max, d_max = 256, 0
        for t in toks:
            if len(t) == 4:
                cl_values.append(t[0] + 257)
                d_values.append(t[1])
                cl_max = max(cl_max, t[0] + 257)
                d_max = max(d_max, t[1])
            else:
                cl_values.append(t[0])
                cl_max = max(cl_max, t[0])
        lt = huffman_bitlens(cl_values, 15)
        dt = huffman_bitlens(d_values, 15)
        codelens = [lt.get(i, 0) for i in range(cl_max + 1)]
        hlit = len(codelens)
        codelens += [dt.get(i, 0) for i in range(d_max + 1)]
        hdist = len(codelens) - hlit
        rl_codes, rl_counts = rle_codelens(codelens)
        ct = huffman_bitlens(rl_codes, 7)
        hclen = 0
        for idx, v in enumerate(CODELEN_VALUES):
            if v in ct:
                hclen = idx + 1
        bw.write_lsb(hlit - 257, 5)
        bw.write_lsb(hdist - 1, 5)
        bw.write_lsb(hclen - 4, 4)
        ctab = canonical_codes(ct) if ct else {}
        for i in range(hclen):
            bw.write_lsb(ctab.get(CODELEN_VALUES[i], (0, 0))[1], 3)
        for v, cnt in zip(rl_codes, rl_counts):
            c, l = ctab[v]
            bw.write_code(c, l)
            if v == 18:
                bw.write_lsb(cnt - 11, 7)
            elif v == 17:
                bw.write_lsb(cnt - 3, 3)
            elif v == 16:
                bw.write_lsb(cnt - 3, 2)
        ltab = canonical_codes(lt)
        dtab = canonical_codes(dt) if dt else {}
        for t in toks:
            if len(t) == 4:
                lcode, dcode, ln, dist = t
                c, l = ltab[lcode + 257]
                bw.write_code(c, l)
                if LEN_EXTRA[lcode]:
                    bw.write_lsb(ln - LEN_BASE[lcode], LEN_EXTRA[lcode])
                c, l = dtab[dcode]
                bw.write_code(c, l)
                if DIST_EXTRA[dcode]:
                    bw.write_lsb(dist - DIST_BASE[dcode], DIST_EXTRA[dcode])
            else:
                c, l = ltab[t[0]]
                bw.write_code(c, l)
        c, l = ltab[256]
        bw.write_code(c, l)
        pos += BLOCK
        if pos >= n:
            break
    bw.pad()
    body = bytes(bw.out)
    adler = zlib.adler32(data) & 0xFFFFFFFF
    return b"\x78\x9c" + body + adler.to_bytes(4, "big")


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/golden/raw.bin"
    data = open(path, "rb").read()
    t0 = time.perf_counter()
    out = deflate_reference(data)
    dt = time.perf_counter() - t0
    ok = zlib.decompress(out) == data
    print(f"input {len(data)} -> reference-model deflate {len(out)} bytes "
          f"(ratio {len(out)/len(data):.4f}), conformant={ok}, {dt:.1f}s (python model; "
          f"not a speed measurement of the JS reference)")
