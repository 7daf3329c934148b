#!/usr/bin/env python
"""Independent pure-Python replay of the DataSketches HLL coupon path.

Provenance (VERDICT r05 #4 demanded a NON-CIRCULAR pin for
q92_hll_distinct_mv): everything here derives from PUBLISHED algorithm
descriptions, not from Spark's output —

- ``murmur3_x64_128``: MurmurHash3 x64 128-bit (Austin Appleby, public
  domain); pinned against the published 'hello'/seed-0 test vector in
  tests/test_hll_replay.py.
- ``coupon_for_long``: the Apache DataSketches HLL coupon mapping
  (seed 9001, key = low 26 bits of h1, value = nlz(h2)+1 capped at 63)
  over the 8-byte little-endian encoding of the long — the library's
  ``update(long)`` path, which Spark's ``hll_sketch_agg`` calls for
  both int and long columns (int==long sketch-byte parity is pinned in
  the tests).
- ``parse_coupons`` / ``sketch_mode``: the published DataSketches HLL
  serialization preamble (preInts 2=LIST, 3=SET, 10=HLL array).

WHY ONLY THE COUPON PATH: below promotion the sketch stores the exact
coupon SET, the estimate is the coupon-collector inversion of the
coupon count (~c + c^2/2^27, which rounds to c for every c below
promotion), and the result is a pure SET function of the input — so
``coupon_count`` reproduces Spark's estimate EXACTLY, independently.
At promotion (measured: distinct-coupon count 385 = the 3/4 load
factor on the 2^(lgK-3)=512-slot max coupon array for lgConfigK=12)
the library replays the coupons into an HLL array and the estimate
switches to the HIP accumulator, which is a function of coupon
INSERTION ORDER — measured: 1000 sequential longs estimate 996
ascending vs 990 descending on one partition, and 5 partitionings of
the same 1500 ids gave 5 different estimates. Above promotion there
is NO set-function oracle to write, for ANY implementation — the
value itself is merge-order defined. See COVERAGE.md (q92 residue row)
and tests/test_hll_replay.py, which pins every fact above.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

# DataSketches constants (published): default update seed, coupon
# layout, lgConfigK used by Spark's hll_sketch_agg default.
DEFAULT_UPDATE_SEED = 9001
KEY_BITS_26 = 26
KEY_MASK_26 = (1 << KEY_BITS_26) - 1
LG_CONFIG_K = 12
# SET->HLL promotion: the coupon hash array is capped at
# 2^(lgConfigK-3) ints and grows at 3/4 load, so the 385th distinct
# coupon promotes (measured via the serialized preamble and pinned in
# tests/test_hll_replay.py::test_promotion_threshold).
COUPON_REGIME_MAX = 384


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK
    h ^= h >> 33
    return h


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (public domain reference algorithm),
    returning (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    h1 = h2 = seed & _MASK
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def coupon_for_long(v: int) -> int:
    """DataSketches HLL coupon for ``update(long v)``: murmur3-128 of
    the 8-byte little-endian two's-complement encoding with seed 9001;
    key = low 26 bits of h1, value = (leading zeros of h2, capped at
    62) + 1; coupon = (value << 26) | key."""
    h1, h2 = murmur3_x64_128(
        (v & _MASK).to_bytes(8, "little"), DEFAULT_UPDATE_SEED
    )
    addr26 = h1 & KEY_MASK_26
    lz = 64 - h2.bit_length()  # h2==0 impossible after fmix of real input
    value = min(lz, 62) + 1
    return (value << KEY_BITS_26) | addr26


def coupon_count(user_ids) -> int:
    """Distinct-coupon count for a collection of int/long values
    (None skipped, as the sketch skips SQL NULLs). In the coupon
    regime (count <= COUPON_REGIME_MAX) this IS Spark's rounded
    ``hll_sketch_estimate``, whatever the merge/partition order."""
    return len({coupon_for_long(int(v)) for v in user_ids if v is not None})


def sketch_mode(sketch_bytes: bytes) -> str:
    """Current mode of a serialized DataSketches HLL sketch, from the
    published preamble: preInts 2=LIST, 3=SET, 10=HLL."""
    return {2: "LIST", 3: "SET", 10: "HLL"}.get(
        sketch_bytes[0], f"unknown(preInts={sketch_bytes[0]})"
    )


def parse_coupons(sketch_bytes: bytes) -> set[int]:
    """Coupon set of a serialized LIST/SET-mode sketch: little-endian
    int32 array after the preamble (preInts*4 bytes); zero ints are
    empty hash-set slots."""
    pre_ints = sketch_bytes[0]
    if pre_ints not in (2, 3):
        raise ValueError(f"not a coupon-mode sketch (preInts={pre_ints})")
    body = sketch_bytes[pre_ints * 4 :]
    out = set()
    for i in range(0, len(body) - 3, 4):
        c = int.from_bytes(body[i : i + 4], "little")
        if c:
            out.add(c)
    return out
