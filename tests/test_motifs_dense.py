"""Dense-graph goldens for the enumeration motifs (VERDICT r01 §9):
tadpole/fish/lollipop on K12 — every vertex degree 11, density 1.0 —
with expected counts from literal Python loops that mirror the
operators' (and the reference apps') enumeration semantics
(``apps/undirected_tadpole_counting.cpp:67-100``,
``undirected_fish_counting.cpp:67-105``). Proves the conjunctive
self-join plans stay exact when every list is maximally dense, not
just on the 44-edge sparse fixture.

Both methods are asserted here: ``enumerate`` (the instance-stream
join, which mirrors the reference loops literally) and the default
``factorized`` closed form, which never materializes instances and is
the only path that finishes on dense co-order graphs (sf0.01 eparts:
1,491,923,595,749 tadpoles in ~9 s, 69,392,205,202 fish in ~22 s at
local[16] — the enumerators' ~10^13-instance streams never finish;
bench.py records the factorized timings per round).
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


@pytest.mark.parametrize("method", ["factorized", "enumerate"])
def test_k12_tadpole(k12, method):
    from simdgraphprocessing_spark.operators.motifs import tadpole_count

    assert tadpole_count(k12, method=method).collect()[0]["tadpoles"] == brute_tadpole()


@pytest.mark.parametrize("method", ["factorized", "enumerate"])
def test_k12_fish(k12, method):
    from simdgraphprocessing_spark.operators.motifs import fish_count

    assert fish_count(k12, method=method).collect()[0]["fishes"] == brute_fish()


def test_k12_lollipop(k12):
    from simdgraphprocessing_spark.operators import lollipop_count

    # K12: tri(v) = C(11,2) = 55, deg = 11 → 12·55·11 = 7260
    assert lollipop_count(k12).collect()[0]["lollipops"] == 7260
