"""Vectorized set kernels (numpy) — the engine's Arrow-side hot path.

These reproduce the *semantics and adaptive dispatch* of the
reference's SIMD set operations (``src/set/ops/intersection.hpp``,
``union.hpp``, ``difference.hpp``) without porting any SIMD code:
numpy's vectorized primitives over Arrow-delivered batches play the
role the intrinsics played.

Adaptive choices kept from the reference:
* galloping vs merge intersection when ``max/min cardinality > 32``
  (dispatcher ``intersection.hpp:1325-1336``) →
  ``np.searchsorted`` probe of the rare set into the frequent one;
* array vs bitmap representation by density
  (``hybrid.hpp:55-100``, threshold ``common.hpp:73`` 1/256) →
  :func:`choose_layout` + packed ``np.uint64`` bitmap kernels.

Everything here runs inside pandas/Arrow UDF batches on executors;
no per-row Python ever touches these paths.
"""

from __future__ import annotations

import numpy as np

GALLOP_RATIO = 32  # reference: intersection.hpp:1325-1336
BITSET_DENSITY = 1.0 / 256  # reference: common.hpp:73 (bitset_req)


def intersect_count(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for sorted unique int arrays, adaptive gallop/merge."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb > la * GALLOP_RATIO:
        # galloping: binary-probe the rare set into the frequent set
        # (reference set_intersect_galloping, intersection.hpp:393-585)
        idx = np.searchsorted(b, a)
        idx[idx == lb] = lb - 1
        return int(np.count_nonzero(b[idx] == a))
    # merge path (reference set_intersect_standard, :696-828)
    return int(np.intersect1d(a, b, assume_unique=True).size)


def intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """A ∩ B (sorted unique inputs → sorted unique output)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return a[:0]
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb > la * GALLOP_RATIO:
        idx = np.searchsorted(b, a)
        idx[idx == lb] = lb - 1
        return a[b[idx] == a]
    return np.intersect1d(a, b, assume_unique=True)


def union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """A ∪ B (reference union.hpp accumulator semantics)."""
    return np.union1d(a, b)


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """A ∖ B — the BFS new-frontier op (reference difference.hpp:5-84,
    used apps/n_path.cpp:78)."""
    return np.setdiff1d(a, b, assume_unique=True)


# ---------------------------------------------------------------- bitmaps


def choose_layout(cardinality: int, universe: int) -> str:
    """Per-set layout decision by density — the reference's hybrid
    dispatch (``hybrid.hpp:55-100``): dense → bitmap, sparse → array."""
    if universe <= 0:
        return "array"
    return "bitset" if cardinality / universe > BITSET_DENSITY else "array"

def to_bitmap(a: np.ndarray, universe: int) -> np.ndarray:
    """Pack sorted ids into a uint64 word bitmap (bitset layout,
    ``src/set/layouts/bitset.hpp:65-96``)."""
    bm = np.zeros((universe + 63) // 64, dtype=np.uint64)
    np.bitwise_or.at(bm, a >> 6, np.uint64(1) << (a.astype(np.uint64) & np.uint64(63)))
    return bm


def from_bitmap(bm: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(bm.view(np.uint8), bitorder="little")
    return np.nonzero(bits)[0].astype(np.int64)


def bitmap_intersect_count(bm_a: np.ndarray, bm_b: np.ndarray) -> int:
    """Word-AND + popcount (reference intersection.hpp:880-955)."""
    n = min(len(bm_a), len(bm_b))
    words = np.bitwise_and(bm_a[:n], bm_b[:n])
    return int(np.unpackbits(words.view(np.uint8)).sum())


def probe_bitmap_count(a: np.ndarray, bm: np.ndarray) -> int:
    """uint-into-bitset probe (reference intersection.hpp:1023-1061)."""
    limit = len(bm) << 6
    a = a[a < limit]
    if a.size == 0:
        return 0
    words = bm[a >> 6]
    return int(np.count_nonzero((words >> (a.astype(np.uint64) & np.uint64(63))) & np.uint64(1)))


def intersect_count_many(
    offsets_a: np.ndarray,
    values_a: np.ndarray,
    offsets_b: np.ndarray,
    values_b: np.ndarray,
) -> np.ndarray:
    """Batched |A_i ∩ B_i| over two list-columns delivered as Arrow
    offsets+values (zero-copy from ``pyarrow.ListArray``).

    This is the per-edge triangle kernel: row i holds the oriented
    neighbor lists of the two endpoints of edge i.
    """
    n = len(offsets_a) - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        a = values_a[offsets_a[i] : offsets_a[i + 1]]
        b = values_b[offsets_b[i] : offsets_b[i + 1]]
        out[i] = intersect_count(a, b)
    return out
