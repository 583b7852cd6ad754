"""The reference's full physical set-layout surface, in numpy.

The reference carries five alternative *encodings* of one semantic
object — a sorted set of uint32 — and an intersect kernel for every
encoding pair (``src/set/layouts/*.hpp``, ``src/set/ops/
intersection.hpp``).  The engine's production paths (``kernels.py``)
reproduce the two encodings that matter at scale (sorted array,
packed bitmap) plus the adaptive dispatch; this module completes the
remaining layout families so the whole §2.3 kernel matrix exists,
executes, and is property-tested against ``np.intersect1d`` oracles:

* ``pshort``   — 16-bit values grouped under a shared high-16-bit
  prefix partition (``src/set/layouts/pshort.hpp:46-78``);
* ``bitset_new`` — block-indexed bitset: sorted block-id directory +
  fixed 128-bit blocks (``src/set/layouts/bitset_new.hpp:81-130``,
  ``BLOCK_SIZE`` ``src/common.hpp:29``);
* ``new_type`` — per-128-block hybrid, each block independently
  array- or bitset-encoded by its own density
  (``src/set/layouts/new_type.hpp:50-90``, threshold
  ``common.hpp:30`` = 1/16);
* ``kunle``   — 3-level hierarchical bitset
  (``src/set/layouts/kunle.hpp:10,62-131``);
* ``set_intersect_v1`` / ``set_intersect_ibm`` — alternative
  uint∩uint schemes with identical semantics
  (``src/set/ops/intersection.hpp:124-392,586-695``).

Like the reference, these alternates are NOT on the production hot
path — the engine's dispatcher (``kernels.intersect_count``) only
ever picks merge vs galloping, exactly as the reference's
``set_intersect`` dispatcher does (``intersection.hpp:1325-1336``) —
but a user of the reference who relied on any layout finds the same
encoding and the same kernel pair here, vectorized (no per-element
Python loops anywhere in this module).

All encoders take sorted unique non-negative int arrays (the
``MutableGraph.hpp:588`` invariant) and return plain numpy
structures; everything runs happily inside Arrow-batch UDFs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import kernels

# reference constants
PSHORT_SHIFT = 16  # pshort.hpp:55-56 (high/low dword split)
BLOCK_SIZE = 128  # common.hpp:29
BLOCK_WORDS = BLOCK_SIZE // 64
NEWTYPE_BITSET_THRESHOLD = 1.0 / 16.0  # common.hpp:30
KUNLE_LEVELS = 3  # kunle.hpp:10
KUNLE_FANOUT = 64  # one uint64 word summarizes 64 children


# --------------------------------------------------------------- pshort


class PShort(NamedTuple):
    """Prefix-partitioned 16-bit encoding (``pshort.hpp:46-78``):
    ``prefixes[p]`` is partition p's high-16 bits, its low-16-bit
    members are ``lo16[offsets[p]:offsets[p+1]]`` (sorted)."""

    prefixes: np.ndarray  # int64, sorted unique
    offsets: np.ndarray  # int64, len = len(prefixes)+1
    lo16: np.ndarray  # uint16, sorted within each partition


def pshort_encode(a: np.ndarray) -> PShort:
    a = np.asarray(a, dtype=np.int64)
    hi = a >> PSHORT_SHIFT
    prefixes, counts = np.unique(hi, return_counts=True)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return PShort(prefixes, offsets, (a & 0xFFFF).astype(np.uint16))


def pshort_decode(e: PShort) -> np.ndarray:
    lens = np.diff(e.offsets)
    return np.repeat(e.prefixes << PSHORT_SHIFT, lens) + e.lo16.astype(np.int64)


def _pshort_keys_for_partitions(e: PShort, part_idx: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """Composite ``rank·2^16 + lo16`` keys for the members of the
    selected partitions, where ``rank[j]`` renumbers selected
    partition ``part_idx[j]``.  Globally sorted because partitions are
    visited in increasing rank and lo16 is sorted within each."""
    lens = (e.offsets[part_idx + 1] - e.offsets[part_idx]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out_off = np.concatenate(([0], np.cumsum(lens)))
    gather = np.arange(total, dtype=np.int64) + np.repeat(
        e.offsets[part_idx].astype(np.int64) - out_off[:-1], lens
    )
    seg = np.repeat(rank.astype(np.int64), lens)
    return (seg << PSHORT_SHIFT) + e.lo16[gather].astype(np.int64)


def pshort_intersect_count(ea: PShort, eb: PShort) -> int:
    """pshort ∩ pshort (``intersection.hpp:829-879``): merge the
    prefix-partition directories, then intersect the 16-bit members of
    every common partition — here as ONE composite-key probe across
    all common partitions at once."""
    common, ia, ib = np.intersect1d(ea.prefixes, eb.prefixes, return_indices=True)
    if common.size == 0:
        return 0
    rank = np.arange(common.size, dtype=np.int64)
    ka = _pshort_keys_for_partitions(ea, ia, rank)
    kb = _pshort_keys_for_partitions(eb, ib, rank)
    return kernels.intersect_count(ka, kb)


def uint_pshort_intersect_count(a: np.ndarray, eb: PShort) -> int:
    """uint ∩ pshort (``intersection.hpp:1062-1173``): route each
    integer's high bits to its partition (one searchsorted over the
    prefix directory), then probe its low 16 bits into that
    partition's members."""
    a = np.asarray(a, dtype=np.int64)
    if a.size == 0 or eb.prefixes.size == 0:
        return 0
    hi = a >> PSHORT_SHIFT
    pos = np.searchsorted(eb.prefixes, hi)
    pos_c = np.minimum(pos, eb.prefixes.size - 1)
    hit = eb.prefixes[pos_c] == hi
    if not hit.any():
        return 0
    sel, pos_hit = a[hit], pos_c[hit]
    # composite keys in the FULL partition numbering of eb
    ka = (pos_hit << PSHORT_SHIFT) + (sel & 0xFFFF)
    all_rank = np.arange(eb.prefixes.size, dtype=np.int64)
    kb = _pshort_keys_for_partitions(eb, all_rank, all_rank)
    idx = np.searchsorted(kb, ka)
    idx = np.minimum(idx, kb.size - 1)
    return int(np.count_nonzero(kb[idx] == ka))


def pshort_bitset_intersect_count(ea: PShort, bm: np.ndarray) -> int:
    """pshort ∩ bitset (``intersection.hpp:956-1017``): reconstruct
    each member's absolute bit index (prefix·2^16 + lo16, exactly what
    the reference's partition probe computes) and test the bitmap."""
    return kernels.probe_bitmap_count(pshort_decode(ea), bm)


# ----------------------------------------------------------- bitset_new


class BitsetNew(NamedTuple):
    """Block-indexed bitset (``bitset_new.hpp:81-130``): sorted
    directory of occupied 128-bit block ids + 2 uint64 words/block."""

    block_ids: np.ndarray  # int64, sorted unique
    words: np.ndarray  # uint64, shape (n_blocks, BLOCK_WORDS)


def bsnew_encode(a: np.ndarray) -> BitsetNew:
    a = np.asarray(a, dtype=np.int64)
    blocks = a // BLOCK_SIZE
    block_ids, inverse = np.unique(blocks, return_inverse=True)
    words = np.zeros((block_ids.size, BLOCK_WORDS), dtype=np.uint64)
    bit = a % BLOCK_SIZE
    flat = inverse * BLOCK_WORDS + bit // 64
    np.bitwise_or.at(
        words.reshape(-1), flat, np.uint64(1) << (bit.astype(np.uint64) % np.uint64(64))
    )
    return BitsetNew(block_ids, words)


def bsnew_decode(e: BitsetNew) -> np.ndarray:
    if e.block_ids.size == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(e.words.reshape(-1).view(np.uint8), bitorder="little")
    local = np.nonzero(bits)[0].astype(np.int64)
    return e.block_ids[local // BLOCK_SIZE] * BLOCK_SIZE + local % BLOCK_SIZE


def bsnew_intersect_count(ea: BitsetNew, eb: BitsetNew) -> int:
    """bitset_new ∩ bitset_new: merge the block directories
    (``intersect_offsets``, ``intersection.hpp:1285-1320``) then AND +
    popcount only the common blocks (``intersect_block``,
    ``:1338-1364``; pair kernel ``:1365-1414``)."""
    _, ia, ib = np.intersect1d(ea.block_ids, eb.block_ids, return_indices=True)
    if ia.size == 0:
        return 0
    words = np.bitwise_and(ea.words[ia], eb.words[ib])
    return int(np.unpackbits(words.reshape(-1).view(np.uint8)).sum())


def uint_bsnew_intersect_count(a: np.ndarray, eb: BitsetNew) -> int:
    """uint ∩ bitset_new (``probe_block``, ``intersection.hpp:
    1447-1511``): locate each integer's block in the directory, then
    test its bit inside the 128-bit block."""
    a = np.asarray(a, dtype=np.int64)
    if a.size == 0 or eb.block_ids.size == 0:
        return 0
    blk = a // BLOCK_SIZE
    pos = np.searchsorted(eb.block_ids, blk)
    pos_c = np.minimum(pos, eb.block_ids.size - 1)
    hit = eb.block_ids[pos_c] == blk
    if not hit.any():
        return 0
    bit = (a[hit] % BLOCK_SIZE).astype(np.uint64)
    w = eb.words[pos_c[hit], (bit // np.uint64(64)).astype(np.int64)]
    return int(np.count_nonzero((w >> (bit % np.uint64(64))) & np.uint64(1)))


# ------------------------------------------------------------- new_type


class NewType(NamedTuple):
    """Per-128-block hybrid (``new_type.hpp:50-90``): blocks whose own
    density exceeds 1/16 go to a bitset_new part, the rest stay a
    plain sorted array — the two parts partition the value space by
    block, so a set's members live in exactly one part."""

    uint_part: np.ndarray  # int64, sorted
    bs_part: BitsetNew


def newtype_encode(a: np.ndarray) -> NewType:
    a = np.asarray(a, dtype=np.int64)
    if a.size == 0:
        return NewType(a, bsnew_encode(a))
    blocks = a // BLOCK_SIZE
    _, inverse, counts = np.unique(blocks, return_inverse=True, return_counts=True)
    per_elem = counts[inverse]
    # reference: density = 0 when the block holds < 2 elements
    # (new_type.hpp:65), else count/BLOCK_SIZE
    dense = (per_elem >= 2) & (per_elem / BLOCK_SIZE > NEWTYPE_BITSET_THRESHOLD)
    return NewType(a[~dense], bsnew_encode(a[dense]))


def newtype_decode(e: NewType) -> np.ndarray:
    return np.union1d(e.uint_part, bsnew_decode(e.bs_part))


def newtype_intersect_count(ea: NewType, eb: NewType) -> int:
    """new_type ∩ new_type (``intersection.hpp:1559-1650``): a block
    may be array-encoded in one set and bitset-encoded in the other,
    so the count is the sum of the four part-pair kernels — each pair
    disjoint because parts split by block within a set."""
    return (
        kernels.intersect_count(ea.uint_part, eb.uint_part)
        + uint_bsnew_intersect_count(ea.uint_part, eb.bs_part)
        + uint_bsnew_intersect_count(eb.uint_part, ea.bs_part)
        + bsnew_intersect_count(ea.bs_part, eb.bs_part)
    )


# ---------------------------------------------------------------- kunle


class Kunle(NamedTuple):
    """3-level hierarchical bitset (``kunle.hpp:10,62-131``): level 0
    is the leaf bitmap over the universe; each level above holds one
    bit per 64-bit word of the level below (the reference's per-level
    bins + skip lists).  ``levels[k]`` is the uint64 word array of
    level k, leaf first."""

    levels: tuple  # of np.ndarray (uint64), leaf first
    universe: int


def kunle_encode(a: np.ndarray, universe: int) -> Kunle:
    a = np.asarray(a, dtype=np.int64)
    levels = [kernels.to_bitmap(a, max(universe, 1))]
    for _ in range(KUNLE_LEVELS - 1):
        below = levels[-1]
        occupied = np.nonzero(below)[0].astype(np.int64)
        levels.append(kernels.to_bitmap(occupied, max(below.size, 1)))
    return Kunle(tuple(levels), universe)


def kunle_decode(e: Kunle) -> np.ndarray:
    return kernels.from_bitmap(e.levels[0])


def kunle_intersect_count(ea: Kunle, eb: Kunle) -> int:
    """kunle ∩ kunle (``intersection.hpp:1651-1724``): AND the top
    summary level first and descend only through bins both sets
    occupy, so sparse sets never touch most leaf words."""
    top = KUNLE_LEVELS - 1
    n = min(ea.levels[top].size, eb.levels[top].size)
    live = np.nonzero(np.bitwise_and(ea.levels[top][:n], eb.levels[top][:n]))[0]
    if live.size == 0:
        return 0
    for lvl in range(top - 1, -1, -1):
        # expand live summary words -> candidate word indices below
        cand = (live[:, None] * 64 + np.arange(64, dtype=np.int64)).reshape(-1)
        la, lb = ea.levels[lvl], eb.levels[lvl]
        cand = cand[cand < min(la.size, lb.size)]
        words = np.bitwise_and(la[cand], lb[cand])
        if lvl == 0:
            return int(np.unpackbits(words.view(np.uint8)).sum())
        live = cand[words != 0]
        if live.size == 0:
            return 0
    return 0


# ------------------------------------ compressed at-rest encodings


def variant_encode(a: np.ndarray) -> np.ndarray:
    """Delta + byte-aligned varint stream (``src/set/layouts/
    variant.hpp:91-108``, deltas ``:41``): 7 data bits per byte,
    little-endian, high bit = continuation.  Like the reference, this
    is an AT-REST format — compute always goes through decode first
    (``Set::decode``, ``src/set/Set.hpp:148-155``).  Encoded without
    per-element Python: a ≤10-pass loop over byte *positions*, each
    pass one vectorized scatter."""
    a = np.asarray(a, dtype=np.int64)
    n = a.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = a[0]
    deltas[1:] = np.diff(a).astype(np.uint64)
    lens = np.ones(n, dtype=np.int64)
    tmp = deltas >> np.uint64(7)
    while tmp.any():
        lens += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    for k in range(int(lens.max())):
        rows = lens > k
        byte = (deltas[rows] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (lens[rows] > k + 1).astype(np.uint8) << 7
        out[offs[rows] + k] = byte.astype(np.uint8) | cont
    return out


def variant_decode(stream: np.ndarray) -> np.ndarray:
    stream = np.asarray(stream, dtype=np.uint8)
    if stream.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.nonzero((stream & 0x80) == 0)[0]  # terminator bytes
    n = ends.size
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    val_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos = np.arange(stream.size, dtype=np.int64) - np.repeat(starts, lens)
    vals = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(
        vals, val_idx, (stream & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    )
    return np.cumsum(vals.astype(np.int64))


def bitpacked_encode(a: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Delta + fixed-width bit-packing (``src/set/layouts/
    bitpacked.hpp:44-131``): every delta stored in the stream-wide
    maximum bit width.  Returns ``(n, width, packed_bytes)``.  At-rest
    only, like the reference (decode before compute)."""
    a = np.asarray(a, dtype=np.int64)
    n = a.size
    if n == 0:
        return 0, 0, np.empty(0, dtype=np.uint8)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = a[0]
    deltas[1:] = np.diff(a).astype(np.uint64)
    width = max(1, int(deltas.max()).bit_length())
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((deltas[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return n, width, np.packbits(bits.reshape(-1), bitorder="little")


def bitpacked_decode(n: int, width: int, packed: np.ndarray) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(packed, bitorder="little")[: n * width]
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64)).astype(np.uint64)
    deltas = (bits.reshape(n, width).astype(np.uint64) * weights).sum(axis=1)
    return np.cumsum(deltas.astype(np.int64))


# ------------------------------------------- alternate uint∩uint schemes


def intersect_count_v1(a: np.ndarray, b: np.ndarray) -> int:
    """``set_intersect_v1`` analog (``intersection.hpp:124-392``): an
    alternative scheme with identical semantics — an unconditional
    probe of every element of the smaller side into the larger
    (the reference's v1 is likewise a fixed strategy; only the
    production dispatcher adapts).  Exists for kernel parity and as a
    cross-check oracle for the adaptive kernel."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if a.size > b.size:
        a, b = b, a
    if a.size == 0 or b.size == 0:
        return 0
    idx = np.searchsorted(b, a)
    idx = np.minimum(idx, b.size - 1)
    return int(np.count_nonzero(b[idx] == a))


def intersect_count_ibm(a: np.ndarray, b: np.ndarray) -> int:
    """``set_intersect_ibm`` analog (``intersection.hpp:586-695``):
    a second fixed-strategy alternate — scatter one side's membership
    into a flag array over the shared value window, gather the other
    side through it (the STTNI-register compare recast as a bounded
    scatter/gather).  Falls back to the probe scheme when the value
    window is too wide to flag."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if a.size == 0 or b.size == 0:
        return 0
    lo = int(min(a[0], b[0]))
    hi = int(max(a[-1], b[-1]))
    width = hi - lo + 1
    if width > 64 * (a.size + b.size) + (1 << 16):
        return intersect_count_v1(a, b)  # window too sparse to flag
    flags = np.zeros(width, dtype=bool)
    flags[b - lo] = True
    return int(np.count_nonzero(flags[a - lo]))


# --------------------------------------------------- hybrid dispatch


def hybrid_type(cardinality: int, universe: int) -> str:
    """The reference's three-way density rule (``hybrid.hpp:55-63``):
    density > 1/32 → bitset, > 1/256 → pshort, else uinteger."""
    if universe <= 0 or cardinality == 0:
        return "uinteger"
    density = cardinality / universe
    if density > 1.0 / 32.0:
        return "bitset"
    if density > 1.0 / 256.0:
        return "pshort"
    return "uinteger"


def hybrid_encode(a: np.ndarray, universe: int):
    a = np.asarray(a, dtype=np.int64)
    tag = hybrid_type(a.size, universe)
    if tag == "bitset":
        return tag, kernels.to_bitmap(a, universe)
    if tag == "pshort":
        return tag, pshort_encode(a)
    return tag, a


def hybrid_intersect_count(ha, hb) -> int:
    """Runtime double dispatch on the layout-type pair — the
    reference's if-ladder (``intersection.hpp:2067-2117``), covering
    all pairs over {uinteger, pshort, bitset}."""
    (ta, ea), (tb, eb) = ha, hb
    if ta == tb == "uinteger":
        return kernels.intersect_count(ea, eb)
    if ta == tb == "pshort":
        return pshort_intersect_count(ea, eb)
    if ta == tb == "bitset":
        return kernels.bitmap_intersect_count(ea, eb)
    if ta == "uinteger" and tb == "pshort":
        return uint_pshort_intersect_count(ea, eb)
    if ta == "pshort" and tb == "uinteger":
        return uint_pshort_intersect_count(eb, ea)
    if ta == "uinteger" and tb == "bitset":
        return kernels.probe_bitmap_count(ea, eb)
    if ta == "bitset" and tb == "uinteger":
        return kernels.probe_bitmap_count(eb, ea)
    if ta == "pshort" and tb == "bitset":
        return pshort_bitset_intersect_count(ea, eb)
    if ta == "bitset" and tb == "pshort":
        return pshort_bitset_intersect_count(eb, ea)
    raise ValueError(f"unknown layout pair ({ta}, {tb})")
