#!/usr/bin/env python
"""Independent pure-Python replay of HyperLogLog++ in its
linear-counting regime — the q47 analogue of tools/hll_replay.py.

Provenance (VERDICT r06 #6 asked whether q47's
``approx_count_distinct`` — Spark's HLL++ — admits the same
non-circular pin q92 got): everything here derives from PUBLISHED
algorithm descriptions, not from Spark source —

- ``xxhash64``: the public xxHash XXH64 algorithm (Yann Collet,
  BSD-2); pinned against the published sanity-check vectors in
  tests/test_hllpp_replay.py. Spark hashes a LongType column as the
  8-byte little-endian word with seed 42 (the documented default of
  the public ``xxhash64()`` SQL function, cross-checked black-box
  against that function in the tests — the SQL function is itself a
  public, user-visible surface, so the cross-check pins OUR bytes
  convention, not a Spark internal).
- register fold: the HLL++ paper (Heule/Nunkesser/Hall, EDBT 2013):
  idx = the top ``p`` bits of the hash, rho = 1 + the number of
  leading zeros of the remaining ``64 - p`` bits, register =
  max-fold. A max-fold is a pure SET function — unlike q92's
  DataSketches HIP accumulator there is NO insertion-order state at
  ANY cardinality, which is why this replay can exist at all.
- ``linear_count_estimate``: the paper's small-range path — with V
  zero registers the estimate is H = m * ln(m / V), used whenever
  V > 0 and H <= threshold(p); the per-precision thresholds are the
  paper's published appendix table.

WHY ONLY THE LINEAR-COUNTING REGIME: above threshold(p) the paper's
estimator switches to the bias-corrected raw harmonic mean, whose
correction is an empirical ~200-point interpolation table per
precision. Reproducing those tables verbatim would be copying
constants out of an implementation rather than replaying a published
algorithm, so — mirroring q92's measured-impossibility discipline —
this replay REFUSES (raises OutOfRegime) instead of guessing. The
events fixtures sit deep inside the regime at every SF (15 / 150 /
1500 distinct users per event_type vs the p=12 threshold of 3100 for
q47's rsd=0.02), so the pin is exact where the driver looks.

The one convention NOT in the paper's text is the p-from-rsd mapping;
``precision_for_rsd`` uses the standard streamlib/HLL++ sizing
p = ceil(2 * log2(1.106 / rsd)) (rsd=0.02 -> p=12, m=4096), and the
tests verify it the only honest way available: a wrong p makes the
linear count disagree with Spark's estimate on every fixture.
"""

from __future__ import annotations

import math
import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

#: Spark's documented default seed for the public xxhash64() function
#: and for hash-based sketches over it.
SPARK_SEED = 42

#: HLL++ paper appendix: linear-counting switchover threshold per
#: precision p (the estimate is linear counting while H <= this).
THRESHOLD = {
    4: 10, 5: 20, 6: 40, 7: 80, 8: 220, 9: 400, 10: 900, 11: 1800,
    12: 3100, 13: 6500, 14: 11500, 15: 20000, 16: 50000, 17: 120000,
    18: 350000,
}


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 over bytes (public reference algorithm), unsigned 64-bit."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M64), 11)) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of a 64-bit integer column value: the 8-byte
    little-endian word, one full lane (the layout every fixed-width
    hash of a long uses; cross-checked against the public
    ``xxhash64()`` SQL function in the tests)."""
    return xxhash64(struct.pack("<q", v), seed)


def precision_for_rsd(rsd: float) -> int:
    """Registers-from-accuracy sizing: p = ceil(2*log2(1.106/rsd))
    (the standard HLL++ sizing; rsd=0.05 -> p=9, rsd=0.02 -> p=12)."""
    return int(math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0)))


def registers_for_longs(values, p: int, seed: int = SPARK_SEED) -> list[int]:
    """Dense HLL register array per the HLL++ paper: index = top p
    bits, rho = 1 + leading zeros of the remaining 64-p bits (so an
    all-zero suffix yields the max rho of 64-p+1), max-fold."""
    m = 1 << p
    regs = [0] * m
    suffix_bits = 64 - p
    for v in values:
        h = xxhash64_long(int(v), seed)
        idx = h >> suffix_bits
        suffix = (h << p) & _M64
        rho = (64 - suffix.bit_length()) + 1 if suffix else suffix_bits + 1
        if rho > regs[idx]:
            regs[idx] = rho
    return regs


class OutOfRegime(ValueError):
    """The input left HLL++'s linear-counting regime — the estimate
    now depends on the empirical bias tables this replay refuses to
    copy (see module doc)."""


def linear_count_estimate(values, rsd: float = 0.05,
                          seed: int = SPARK_SEED) -> int:
    """Replay approx_count_distinct over int64 values, valid only in
    the linear-counting regime (raises OutOfRegime otherwise)."""
    p = precision_for_rsd(rsd)
    if p not in THRESHOLD:
        raise OutOfRegime(f"precision {p} outside the published table")
    regs = registers_for_longs(values, p, seed)
    m = 1 << p
    zeros = regs.count(0)
    if zeros == 0:
        raise OutOfRegime("no zero registers: linear counting undefined")
    h = m * math.log(m / zeros)
    if h > THRESHOLD[p]:
        raise OutOfRegime(
            f"H={h:.1f} > threshold({p})={THRESHOLD[p]}: bias-corrected"
            " regime, not replayable without the empirical tables"
        )
    # round-half-up on a positive value, the JVM Math.round convention
    # (banker's rounding would disagree on exact .5; H = m*ln(m/V) is
    # transcendental so an exact .5 cannot occur in practice)
    return int(math.floor(h + 0.5))
