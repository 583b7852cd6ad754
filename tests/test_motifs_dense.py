"""Dense-graph goldens for the enumeration motifs (VERDICT r01 §9):
tadpole/fish/lollipop on K12 — every vertex degree 11, density 1.0 —
with expected counts from literal Python loops that mirror the
operators' (and the reference apps') enumeration semantics
(``apps/undirected_tadpole_counting.cpp:67-100``,
``undirected_fish_counting.cpp:67-105``). Proves the conjunctive
self-join plans stay exact when every list is maximally dense, not
just on the 44-edge sparse fixture.

Note on scale: these motif counts are ENUMERATIONS — the count equals
the number of instances, and both the reference's nested SIMD loops
and our joins materialize the instance stream. On graphs where the
instance count itself explodes (dense sf≥0.01 co-order graphs reach
10^13), no enumerator finishes; a factorized counting rewrite is the
documented path there (see motifs.py docstring).
"""

from __future__ import annotations

import pytest

from tests.conftest import edge_df

K = 12
V = list(range(K))
N = {v: [u for u in V if u != v] for v in V}


def k12_pairs():
    return [(i, j) for i in range(K) for j in range(i + 1, K)]


def brute_tadpole() -> int:
    # x,y edge; z∈N(y)∖{x}; w∈N(x)∩N(z), w<y;
    # a∈N(x)∖{y,w,z}; b∈N(a)∖{x} (x∈N(a) always holds here)
    cnt = 0
    for x in V:
        for y in N[x]:
            for z in N[y]:
                if z == x:
                    continue
                for w in N[x]:
                    if w >= y or w not in N[z]:
                        continue
                    for a in N[x]:
                        if a in (y, w, z):
                            continue
                        cnt += len(N[a]) - 1  # b ≠ x
    return cnt


def brute_fish() -> int:
    # x,y edge; z∈N(x)∩N(y), z<y; w∈N(x)∖{y,z};
    # a∈N(w)∖{x,y,z}; b∈N(x)∩N(a), b<w, b∉{y,z}
    cnt = 0
    for x in V:
        for y in N[x]:
            for z in N[x]:
                if z >= y or z not in N[y]:
                    continue
                for w in N[x]:
                    if w in (y, z):
                        continue
                    for a in N[w]:
                        if a in (x, y, z):
                            continue
                        for b in N[x]:
                            if b < w and b not in (y, z) and b in N[a]:
                                cnt += 1
    return cnt


@pytest.fixture(scope="module")
def k12(spark):
    e = edge_df(spark, k12_pairs()).persist()
    e.count()
    yield e
    e.unpersist()


def test_k12_tadpole(k12):
    from simdgraphprocessing_spark.operators.motifs import tadpole_count

    assert tadpole_count(k12).collect()[0]["tadpoles"] == brute_tadpole()


def test_k12_fish(k12):
    from simdgraphprocessing_spark.operators.motifs import fish_count

    assert fish_count(k12).collect()[0]["fishes"] == brute_fish()


def test_k12_lollipop(k12):
    from simdgraphprocessing_spark.operators import lollipop_count

    # K12: tri(v) = C(11,2) = 55, deg = 11 → 12·55·11 = 7260
    assert lollipop_count(k12).collect()[0]["lollipops"] == 7260
