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
# batch kernel: rows whose smaller list reaches this take the per-row
# numpy path (segment-local searches beat the composite probe there)
LONG_ROW = 256


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

def repackage(a: np.ndarray, universe: int) -> tuple[str, np.ndarray]:
    """Re-encode an INTERMEDIATE result by its own density — the
    reference's ``repackage`` (``src/set/ops/repackage.hpp:6-79``):
    after an intersection/union the result's density, not the inputs',
    decides its layout. Returns ``("bitset", packed_words)`` or
    ``("array", a)`` unchanged."""
    if choose_layout(len(a), universe) == "bitset":
        return "bitset", to_bitmap(a, universe)
    return "array", a


def intersect_chain(sets: list[np.ndarray], universe: int) -> np.ndarray:
    """Left-fold intersection of k sorted sets with per-step
    ``repackage`` — the reference's n-clique candidate narrowing
    (``apps/n_clique.cpp`` repeatedly intersects a shrinking candidate
    set against neighbor lists, re-encoding the running result each
    step via ``repackage.hpp``). The running result flips to a packed
    bitmap while dense (probe-per-element lookups, no merge) and back
    to an array once it thins below ``BITSET_DENSITY``."""
    if not sets:
        return np.empty(0, dtype=np.int64)
    tag, acc = repackage(np.asarray(sets[0], dtype=np.int64), universe)
    for s in sets[1:]:
        s = np.asarray(s, dtype=np.int64)
        if tag == "bitset":
            # uint-into-bitset probe, then the result (⊆ s) is an array
            limit = len(acc) << 6
            ss = s[s < limit]
            hit = (
                (acc[ss >> 6] >> (ss.astype(np.uint64) & np.uint64(63)))
                & np.uint64(1)
            ).astype(bool)
            res = ss[hit]
        else:
            res = intersect(acc, s)
        tag, acc = repackage(res, universe)
    return from_bitmap(acc) if tag == "bitset" else acc


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


def intersect_count_pairs(
    starts_a: np.ndarray,
    ends_a: np.ndarray,
    starts_b: np.ndarray,
    ends_b: np.ndarray,
    values: np.ndarray,
) -> np.ndarray:
    """Batched |A_i ∩ B_i| where both sides are slices of ONE shared
    sorted-values array (the broadcast-CSR layout): row i's lists are
    ``values[starts_a[i]:ends_a[i]]`` and ``values[starts_b[i]:ends_b[i]]``.

    Hub-safe split: a row with ANY long side (≥ ``LONG_ROW``) is
    intersected in place against the shared array — gathering it would
    replicate the hub's list once per incident edge, the exact
    data-amplification the broadcast-CSR plan exists to avoid (a
    degree-10⁵ hub appears in up to 10⁵ rows per batch). Only the
    short rows (both sides < LONG_ROW, bounded gather) go through the
    composite-key batch probe. Per-row work for a hub row is
    gallop-bounded — O(|small| · log |hub|) — matching the
    reference's dispatcher (``intersection.hpp:1325-1336``).
    """
    lens_a = (ends_a - starts_a).astype(np.int64)
    lens_b = (ends_b - starts_b).astype(np.int64)
    n = len(lens_a)
    out = np.zeros(n, dtype=np.int64)
    long_mask = np.maximum(lens_a, lens_b) >= LONG_ROW
    short_mask = ~long_mask

    if short_mask.any():

        def gather(starts: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            out_off = np.concatenate(([0], np.cumsum(lens)))
            total = int(out_off[-1])
            if total == 0:
                return out_off, np.empty(0, dtype=np.int64)
            idx = np.arange(total, dtype=np.int64) + np.repeat(
                starts.astype(np.int64) - out_off[:-1], lens
            )
            return out_off, values[idx]

        oa, va = gather(starts_a[short_mask], lens_a[short_mask])
        ob, vb = gather(starts_b[short_mask], lens_b[short_mask])
        out[short_mask] = intersect_count_many(oa, va, ob, vb)

    for i in np.nonzero(long_mask)[0]:
        out[i] = intersect_count(
            values[starts_a[i] : ends_a[i]], values[starts_b[i] : ends_b[i]]
        )
    return out


def _segment_values(offsets: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list offsets may start past 0 (sliced batches): return the
    contiguous value slice and per-segment lengths."""
    lens = np.diff(offsets).astype(np.int64)
    vals = values[int(offsets[0]) : int(offsets[-1])]
    return vals, lens


def intersect_count_many(
    offsets_a: np.ndarray,
    values_a: np.ndarray,
    offsets_b: np.ndarray,
    values_b: np.ndarray,
) -> np.ndarray:
    """Batched |A_i ∩ B_i| over two list-columns delivered as Arrow
    offsets+values (zero-copy from ``pyarrow.ListArray``).

    This is the per-edge triangle kernel: row i holds the oriented
    neighbor lists of the two endpoints of edge i. The whole batch is
    ONE numpy pass — no per-row Python:

    1. pick the globally smaller side as the probe;
    2. composite keys ``segment · U + value`` (U = id universe) make
       both concatenated arrays globally sorted, because segments are
       increasing and each neighbor list is sorted
       (``MutableGraph.hpp:588`` invariant);
    3. one ``searchsorted`` probes every (segment, value) at once —
       the batch-wide form of the reference's galloping branch
       (``intersection.hpp:393-585``); ``bincount`` scatters matches
       back to rows.

    Adaptive split (the batch-level analog of the reference's
    gallop-vs-merge dispatch): rows whose SMALLER list is long
    (≥ ``LONG_ROW``) amortize numpy's per-call overhead and take the
    per-row adaptive kernel with its shallow segment-local searches;
    the (typically vast) remainder of short rows go through the single
    composite probe. On power-law graphs with degree orientation the
    long rows are the few hub edges — exactly the rows where the
    composite key's log(total)-deep binary search would lose.

    Falls back to the per-row adaptive kernel entirely if composite
    keys would overflow int64 (n·U ≥ 2⁶²) — unreachable for
    dense-relabeled graphs at any Arrow batch size.
    """
    n = len(offsets_a) - 1
    if n <= 0:
        return np.zeros(max(n, 0), dtype=np.int64)
    va, lens_a = _segment_values(offsets_a, values_a)
    vb, lens_b = _segment_values(offsets_b, values_b)
    if va.size > vb.size:
        va, vb, lens_a, lens_b = vb, va, lens_b, lens_a
    out = np.zeros(n, dtype=np.int64)
    if va.size == 0 or vb.size == 0:
        return out
    va = va.astype(np.int64, copy=False)
    vb = vb.astype(np.int64, copy=False)
    lo = int(min(va.min(), vb.min()))
    hi = int(max(va.max(), vb.max()))
    u = hi - lo + 1

    long_rows = np.nonzero(np.minimum(lens_a, lens_b) >= LONG_ROW)[0]
    short_mask = np.ones(n, dtype=bool)
    short_mask[long_rows] = False
    if n * u >= (1 << 62):  # composite keys would overflow — all rows looped
        long_rows = np.arange(n)
        short_mask[:] = False

    if short_mask.any():
        keep_a = np.repeat(short_mask, lens_a)
        keep_b = np.repeat(short_mask, lens_b)
        sa = np.repeat(np.arange(n, dtype=np.int64), lens_a)[keep_a]
        sb = np.repeat(np.arange(n, dtype=np.int64), lens_b)[keep_b]
        ka = sa * u + (va[keep_a] - lo)
        kb = sb * u + (vb[keep_b] - lo)
        if kb.size:
            idx = np.searchsorted(kb, ka)
            clamped = np.minimum(idx, kb.size - 1)
            match = (kb[clamped] == ka) & (idx < kb.size)
            out += np.bincount(sa[match], minlength=n).astype(np.int64)

    # cumulative segment starts within the (possibly swapped) slices
    if long_rows.size:
        starts_a = np.concatenate(([0], np.cumsum(lens_a)))
        starts_b = np.concatenate(([0], np.cumsum(lens_b)))
        for i in long_rows:
            out[i] = intersect_count(
                va[starts_a[i] : starts_a[i + 1]],
                vb[starts_b[i] : starts_b[i + 1]],
            )
    return out
