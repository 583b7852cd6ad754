"""Property tests for the full §2.3 layout surface (layouts.py) —
every encoding round-trips and every intersect kernel in the matrix
matches the ``np.intersect1d`` oracle, mirroring how the reference's
alternates were only ever semantic twins of one intersect
(``src/set/ops/intersection.hpp``)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simdgraphprocessing_spark import kernels, layouts

UNIVERSE = 1 << 18  # spans > 2 pshort prefixes and many 128-bit blocks

sorted_sets = st.lists(st.integers(0, UNIVERSE - 1), max_size=500).map(
    lambda xs: np.array(sorted(set(xs)), dtype=np.int64)
)
# clustered sets exercise dense blocks / shared prefixes
clustered_sets = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 300)), max_size=400
).map(
    lambda ps: np.array(
        sorted({base * 4096 + off for base, off in ps}), dtype=np.int64
    )
)
any_sets = st.one_of(sorted_sets, clustered_sets)


def oracle(a, b):
    return int(np.intersect1d(a, b).size)


# ------------------------------------------------------------ roundtrips


@settings(max_examples=100, deadline=None)
@given(any_sets)
def test_pshort_roundtrip(a):
    assert np.array_equal(layouts.pshort_decode(layouts.pshort_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(any_sets)
def test_bsnew_roundtrip(a):
    assert np.array_equal(layouts.bsnew_decode(layouts.bsnew_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(any_sets)
def test_newtype_roundtrip(a):
    e = layouts.newtype_encode(a)
    assert np.array_equal(layouts.newtype_decode(e), a)
    # the two parts partition the set: no element in both
    assert oracle(e.uint_part, layouts.bsnew_decode(e.bs_part)) == 0


@settings(max_examples=60, deadline=None)
@given(any_sets)
def test_kunle_roundtrip(a):
    assert np.array_equal(
        layouts.kunle_decode(layouts.kunle_encode(a, UNIVERSE)), a
    )


def test_newtype_dense_blocks_go_to_bitset():
    # one full 128-block (density 1 > 1/16) + isolated sparse values
    dense = np.arange(256, 384, dtype=np.int64)
    sparse = np.array([0, 5000, 90000], dtype=np.int64)
    e = layouts.newtype_encode(np.union1d(dense, sparse))
    assert np.array_equal(e.uint_part, sparse)
    assert np.array_equal(layouts.bsnew_decode(e.bs_part), dense)


# ------------------------------------------------------- intersect matrix


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_pshort_pshort(a, b):
    got = layouts.pshort_intersect_count(
        layouts.pshort_encode(a), layouts.pshort_encode(b)
    )
    assert got == oracle(a, b)


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_uint_pshort(a, b):
    assert layouts.uint_pshort_intersect_count(a, layouts.pshort_encode(b)) == oracle(a, b)


@settings(max_examples=60, deadline=None)
@given(any_sets, any_sets)
def test_pshort_bitset(a, b):
    bm = kernels.to_bitmap(b, UNIVERSE)
    assert layouts.pshort_bitset_intersect_count(layouts.pshort_encode(a), bm) == oracle(a, b)


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_bsnew_bsnew(a, b):
    got = layouts.bsnew_intersect_count(layouts.bsnew_encode(a), layouts.bsnew_encode(b))
    assert got == oracle(a, b)


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_uint_bsnew(a, b):
    assert layouts.uint_bsnew_intersect_count(a, layouts.bsnew_encode(b)) == oracle(a, b)


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_newtype_newtype(a, b):
    got = layouts.newtype_intersect_count(
        layouts.newtype_encode(a), layouts.newtype_encode(b)
    )
    assert got == oracle(a, b)


@settings(max_examples=60, deadline=None)
@given(any_sets, any_sets)
def test_kunle_kunle(a, b):
    got = layouts.kunle_intersect_count(
        layouts.kunle_encode(a, UNIVERSE), layouts.kunle_encode(b, UNIVERSE)
    )
    assert got == oracle(a, b)


# ------------------------------------------ compressed at-rest encodings


@settings(max_examples=100, deadline=None)
@given(any_sets)
def test_variant_roundtrip(a):
    assert np.array_equal(layouts.variant_decode(layouts.variant_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(any_sets)
def test_bitpacked_roundtrip(a):
    n, w, packed = layouts.bitpacked_encode(a)
    assert np.array_equal(layouts.bitpacked_decode(n, w, packed), a)


@settings(max_examples=40, deadline=None)
@given(any_sets, any_sets)
def test_decode_before_compute(a, b):
    # the reference's Set::decode path: compressed layouts are decoded
    # to uinteger before any intersection (Set.hpp:148-155)
    da = layouts.variant_decode(layouts.variant_encode(a))
    db = layouts.bitpacked_decode(*layouts.bitpacked_encode(b))
    assert kernels.intersect_count(da, db) == oracle(a, b)


def test_variant_multibyte_values():
    a = np.array([0, 127, 128, 16383, 16384, 1 << 30, (1 << 40) + 5], dtype=np.int64)
    enc = layouts.variant_encode(a)
    assert np.array_equal(layouts.variant_decode(enc), a)
    # big gaps force multi-byte varints: stream longer than n bytes
    assert enc.size > a.size


# ------------------------------------------------- alternate uint schemes


@settings(max_examples=100, deadline=None)
@given(any_sets, any_sets)
def test_v1_and_ibm_match_oracle(a, b):
    assert layouts.intersect_count_v1(a, b) == oracle(a, b)
    assert layouts.intersect_count_ibm(a, b) == oracle(a, b)


def test_ibm_wide_window_fallback():
    a = np.array([0, 1 << 40], dtype=np.int64)
    b = np.array([1 << 40], dtype=np.int64)
    assert layouts.intersect_count_ibm(a, b) == 1  # falls back to probe


# --------------------------------------------------------- hybrid ladder


def test_hybrid_type_thresholds():
    # hybrid.hpp:55-63: >1/32 bitset, >1/256 pshort, else uinteger
    assert layouts.hybrid_type(1000, 8192) == "bitset"
    assert layouts.hybrid_type(100, 8192) == "pshort"
    assert layouts.hybrid_type(10, 8192) == "uinteger"
    assert layouts.hybrid_type(0, 8192) == "uinteger"


@settings(max_examples=80, deadline=None)
@given(any_sets, any_sets)
def test_hybrid_ladder_all_pairs(a, b):
    # force every tag onto each operand so all 9 dispatch arms run
    for ta in ("uinteger", "pshort", "bitset"):
        for tb in ("uinteger", "pshort", "bitset"):
            ha = (ta, _encode_as(a, ta))
            hb = (tb, _encode_as(b, tb))
            assert layouts.hybrid_intersect_count(ha, hb) == oracle(a, b), (ta, tb)


def _encode_as(a, tag):
    if tag == "bitset":
        return kernels.to_bitmap(a, UNIVERSE)
    if tag == "pshort":
        return layouts.pshort_encode(a)
    return a


def test_hybrid_encode_follows_density():
    dense = np.arange(0, 1024, 2, dtype=np.int64)  # density 1/2 of 1024
    tag, _ = layouts.hybrid_encode(dense, 1024)
    assert tag == "bitset"
    mid = np.arange(0, 8192, 64, dtype=np.int64)  # density 1/64
    tag, _ = layouts.hybrid_encode(mid, 8192)
    assert tag == "pshort"
    sparse = np.array([0, 5000], dtype=np.int64)
    tag, _ = layouts.hybrid_encode(sparse, UNIVERSE)
    assert tag == "uinteger"
