"""Kernel unit tests vs numpy oracles — the layer the reference lacked
(its kernels were only checked end-to-end, SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simdgraphprocessing_spark import kernels

sorted_sets = st.lists(st.integers(0, 5000), max_size=400).map(
    lambda xs: np.array(sorted(set(xs)), dtype=np.int64)
)


@settings(max_examples=200, deadline=None)
@given(sorted_sets, sorted_sets)
def test_intersect_count_matches_numpy(a, b):
    assert kernels.intersect_count(a, b) == np.intersect1d(a, b).size


@settings(max_examples=100, deadline=None)
@given(sorted_sets, sorted_sets)
def test_intersect_values(a, b):
    got = kernels.intersect(a, b)
    assert np.array_equal(np.sort(got), np.intersect1d(a, b))


@settings(max_examples=100, deadline=None)
@given(sorted_sets, sorted_sets)
def test_union_difference(a, b):
    assert np.array_equal(kernels.union(a, b), np.union1d(a, b))
    assert np.array_equal(kernels.difference(a, b), np.setdiff1d(a, b))


def test_galloping_path_exercised():
    a = np.arange(0, 10, dtype=np.int64)  # small
    b = np.arange(0, 100000, 3, dtype=np.int64)  # large → ratio > 32
    expect = np.intersect1d(a, b).size
    assert kernels.intersect_count(a, b) == expect
    assert kernels.intersect_count(b, a) == expect


@settings(max_examples=60, deadline=None)
@given(sorted_sets, sorted_sets)
def test_bitmap_kernels(a, b):
    universe = 5001
    bm_a, bm_b = kernels.to_bitmap(a, universe), kernels.to_bitmap(b, universe)
    expect = np.intersect1d(a, b).size
    assert kernels.bitmap_intersect_count(bm_a, bm_b) == expect
    assert kernels.probe_bitmap_count(a, bm_b) == expect
    assert np.array_equal(kernels.from_bitmap(bm_a), a)


def test_layout_choice_thresholds():
    # density > 1/256 → bitset (reference common.hpp:73)
    assert kernels.choose_layout(100, 10_000) == "bitset"
    assert kernels.choose_layout(3, 10_000) == "array"
    assert kernels.choose_layout(0, 0) == "array"


def test_intersect_count_many():
    offs = np.array([0, 3, 5, 5], dtype=np.int64)
    vals_a = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    offs_b = np.array([0, 2, 4, 4], dtype=np.int64)
    vals_b = np.array([2, 3, 4, 9], dtype=np.int64)
    out = kernels.intersect_count_many(offs, vals_a, offs_b, vals_b)
    assert out.tolist() == [2, 1, 0]


@settings(max_examples=100, deadline=None)
@given(st.lists(sorted_sets, min_size=1, max_size=5))
def test_intersect_chain_repackage(sets):
    # reference repackage.hpp: per-step re-encoding never changes the
    # result — fold vs one-shot numpy reduce
    expect = sets[0]
    for s in sets[1:]:
        expect = np.intersect1d(expect, s, assume_unique=True)
    got = kernels.intersect_chain(sets, universe=5001)
    assert got.tolist() == expect.tolist()


def test_repackage_flips_layout_by_density():
    dense = np.arange(0, 1000, 2, dtype=np.int64)   # 500/1000 ≫ 1/256
    sparse = np.array([7, 901], dtype=np.int64)      # 2/1000 < 1/256
    tag_d, packed = kernels.repackage(dense, 1000)
    tag_s, arr = kernels.repackage(sparse, 1000)
    assert tag_d == "bitset" and kernels.from_bitmap(packed).tolist() == dense.tolist()
    assert tag_s == "array" and arr is sparse


def test_intersect_chain_empty_and_single():
    assert kernels.intersect_chain([], 100).size == 0
    one = np.array([3, 5], dtype=np.int64)
    assert kernels.intersect_chain([one], 100).tolist() == [3, 5]
    # an empty intermediate stays empty through later steps
    out = kernels.intersect_chain(
        [one, np.empty(0, dtype=np.int64), np.array([3], dtype=np.int64)], 100
    )
    assert out.size == 0


def test_bitmap_roundtrip_odd_universe():
    # universe not a multiple of 64 — the packed tail word must roundtrip
    a = np.array([0, 63, 64, 99], dtype=np.int64)
    bm = kernels.to_bitmap(a, 100)
    assert kernels.from_bitmap(bm).tolist() == a.tolist()
