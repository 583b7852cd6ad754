"""Tadpole/fish motif counts vs brute-force python mirrors of the
reference's exact nested loops (tadpole ``:67-100``, fish ``:80-117``)."""

from __future__ import annotations

import pytest

from simdgraphprocessing_spark.operators.motifs import fish_count, tadpole_count
from tests.conftest import edge_df, k5_pairs, two_triangles_bridge_pairs, zipf_random_pairs


def adj(pairs):
    from collections import defaultdict

    n = defaultdict(set)
    for a, b in pairs:
        n[a].add(b)
        n[b].add(a)
    return n


def tadpole_oracle(pairs):
    N = adj(pairs)
    cnt = 0
    for x in N:
        for y in N[x]:
            for z in N[y]:
                if z == x:
                    continue
                for w in N[x] & N[z]:
                    if w >= y:
                        continue
                    for a in N[x]:
                        if a in (y, w, z):
                            continue
                        for b in N[a]:
                            if b != x:
                                cnt += 1
    return cnt


def fish_oracle(pairs):
    N = adj(pairs)
    cnt = 0
    for x in N:
        for y in N[x]:
            for z in N[x] & N[y]:
                if z >= y:
                    continue
                for w in N[x]:
                    if w in (y, z):
                        continue
                    for a in N[w]:
                        if a in (x, y, z):
                            continue
                        for b in N[x] & N[a]:
                            if b < w and b not in (z, y):
                                cnt += 1
    return cnt


@pytest.mark.parametrize("method", ["factorized", "enumerate"])
@pytest.mark.parametrize(
    "pairs_fn",
    [k5_pairs, two_triangles_bridge_pairs, lambda: zipf_random_pairs(n=40, avg_deg=4)],
)
def test_tadpole_vs_bruteforce(spark, pairs_fn, method):
    pairs = pairs_fn()
    e = edge_df(spark, pairs)
    assert tadpole_count(e, method=method).collect()[0]["tadpoles"] == tadpole_oracle(pairs)


@pytest.mark.parametrize("method", ["factorized", "enumerate"])
@pytest.mark.parametrize(
    "pairs_fn",
    [k5_pairs, two_triangles_bridge_pairs, lambda: zipf_random_pairs(n=40, avg_deg=4)],
)
def test_fish_vs_bruteforce(spark, pairs_fn, method):
    pairs = pairs_fn()
    e = edge_df(spark, pairs)
    assert fish_count(e, method=method).collect()[0]["fishes"] == fish_oracle(pairs)
