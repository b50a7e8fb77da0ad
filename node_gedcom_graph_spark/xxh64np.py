"""Vectorized XXH64 (Spark-compatible, seed 42) over byte windows.

NumPy implementation of the public XXH64 algorithm (Yann Collet's
xxHash, public-domain reference spec) producing values bit-identical
to Spark SQL's ``xxhash64()`` over the same bytes — validated against
``F.xxhash64`` on randomized inputs covering every tail-length path
(tests/test_r11_fixes.py::test_numpy_xxh64_matches_spark).

Written for the ExactSubstr span build (operators/dedup.py): hashing
every w-char window of every document via an Arrow-batch kernel
replaces the per-character Generate fan-out + per-row substring copy +
per-row JVM hash with ~30 whole-array numpy operations per chunk
(guide §4.2). The kernel LOST its interleaved sf10 A/B against the
codegen'd explode form at the fixtures' ~300-char document shape (the
Arrow boundary tax on ~260 output rows/doc exceeds the hash savings —
numbers in substring_dup_spans) and is therefore an opt-in
(NGG_SUBSTR_ARROW=1), kept bit-equality-tested for re-measurement on
wider documents.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's XxHash64 default seed
_M64 = (1 << 64) - 1
# Accumulator init values precomputed in Python ints (numpy warns on
# wrapped *scalar* arithmetic even though it wraps correctly).
_A1_INIT = np.uint64((42 + int(_P1) + int(_P2)) & _M64)
_A2_INIT = np.uint64((42 + int(_P2)) & _M64)
_A3_INIT = np.uint64(42)
_A4_INIT = np.uint64((42 - int(_P1)) & _M64)
_H_SHORT_INIT = np.uint64((42 + int(_P5)) & _M64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc, lane):
    return _rotl(acc + lane * _P2, 31) * _P1


def _merge(h, acc):
    return (h ^ _round(np.uint64(0), acc)) * _P1 + _P4


def xxh64_windows(
    buf: np.ndarray, starts: np.ndarray, w: int
) -> np.ndarray:
    """``XXH64(buf[s:s+w], seed=42)`` for every s in ``starts``.

    ``buf`` must be a 1-D uint8 array with at least 8 bytes of slack
    beyond the last window end (so the unaligned u64/u32 lane views
    exist at every offset; the slack bytes never influence any hash —
    every lane read is fully inside its window). Returns uint64.
    """
    n = len(buf)
    # Little-endian u64/u32 lane value at every byte offset, built once
    # per buffer from 8 (resp. 4) shifted widens.
    u64 = np.zeros(max(n - 7, 0), dtype=np.uint64)
    for k in range(8):
        u64 |= buf[k : k + len(u64)].astype(np.uint64) << np.uint64(8 * k)
    u32 = np.zeros(max(n - 3, 0), dtype=np.uint64)
    for k in range(4):
        u32 |= buf[k : k + len(u32)].astype(np.uint64) << np.uint64(8 * k)

    s = np.asarray(starts, dtype=np.int64)
    nblk = w // 32
    if nblk:
        a1 = np.full(len(s), _A1_INIT, dtype=np.uint64)
        a2 = np.full(len(s), _A2_INIT, dtype=np.uint64)
        a3 = np.full(len(s), _A3_INIT, dtype=np.uint64)
        a4 = np.full(len(s), _A4_INIT, dtype=np.uint64)
        for j in range(nblk):
            o = s + 32 * j
            a1 = _round(a1, u64[o])
            a2 = _round(a2, u64[o + 8])
            a3 = _round(a3, u64[o + 16])
            a4 = _round(a4, u64[o + 24])
        h = _rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)
        h = _merge(h, a1)
        h = _merge(h, a2)
        h = _merge(h, a3)
        h = _merge(h, a4)
    else:
        h = np.full(len(s), _H_SHORT_INIT, dtype=np.uint64)
    h = h + np.uint64(w)
    t = s + 32 * nblk
    rem = w % 32
    while rem >= 8:
        h = h ^ _round(np.uint64(0), u64[t])
        h = _rotl(h, 27) * _P1 + _P4
        t = t + 8
        rem -= 8
    if rem >= 4:
        h = h ^ (u32[t] * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        t = t + 4
        rem -= 4
    while rem >= 1:
        h = h ^ (buf[t].astype(np.uint64) * _P5)
        h = _rotl(h, 11) * _P1
        t = t + 1
        rem -= 1
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_bytes(b: bytes) -> int:
    """Scalar XXH64(seed=42) of one byte string (signed, Spark-long) —
    the exact fallback for variable-byte-width (non-ASCII) windows."""
    buf = np.frombuffer(b, dtype=np.uint8)
    buf = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
    h = xxh64_windows(buf, np.array([0], dtype=np.int64), len(b))[0]
    return int(np.int64(h))
