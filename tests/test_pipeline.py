"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — vs python/numpy oracles on the documents and
embeddings testdata."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from simdgraphprocessing_spark.pipeline import (
    brute_force_topk,
    exact_dedup,
    lang_id,
    lsh_buckets,
    lsh_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_scores,
    simhash_codes,
    simhash_near_pairs,
    token_counts,
    topk_matmul,
    doc_fingerprints,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").persist()
    d.count()
    return d


@pytest.fixture(scope="module")
def embs(spark):
    d = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    d.count()
    return d


@pytest.fixture(scope="module")
def pdocs(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def py_tokens(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def test_exact_dedup(spark, docs, pdocs):
    # add controlled duplicates
    extra = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    d2 = docs.union(extra)
    out = {r["doc_id"]: r["dupes"] for r in exact_dedup(d2).collect()}
    assert len(out) == docs.count()
    assert sum(v == 2 for v in out.values()) == 3


def test_token_counts_vs_python(docs, pdocs):
    got = {r["doc_id"]: (r["n_tokens"], r["n_distinct_tokens"]) for r in token_counts(docs).collect()}
    for did, text in pdocs.items():
        toks = py_tokens(text)
        assert got[did] == (len(toks), len(set(toks)))


def test_ngram_jaccard_vs_python(docs, pdocs):
    thr = 0.5
    got = {(r["a"], r["b"]): r["jac"] for r in ngram_jaccard_pairs(docs, threshold=thr).collect()}
    sets = {d: set(py_tokens(t)) for d, t in pdocs.items()}
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / len(sets[a] | sets[b])
            if round(j, 6) >= thr:
                expect[(a, b)] = round(j, 6)
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9


def test_trigram_shingle_jaccard_runs(docs):
    out = ngram_jaccard_pairs(docs, threshold=0.2, n=3)
    assert out.count() >= 0  # shingle path exercises transform/slice


def test_minhash_lsh_subset_of_true_pairs(docs, pdocs):
    """LSH proposes candidates; after verification every returned pair
    must be a true ≥-threshold pair, and recall on this corpus ≥ 0.9
    for pairs well above threshold."""
    thr = 0.35
    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=thr).collect()}
    sets = {d: set(py_tokens(t)) for d, t in pdocs.items()}
    ids = sorted(sets)
    true_pairs = set()
    strong_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = len(sets[a] | sets[b])
            j = len(sets[a] & sets[b]) / u if u else 0.0
            if round(j, 6) >= thr:
                true_pairs.add((a, b))
            if j >= thr + 0.15:
                strong_pairs.add((a, b))
    assert got <= true_pairs
    if strong_pairs:
        recall = len(got & strong_pairs) / len(strong_pairs)
        assert recall >= 0.9


def test_simhash_deterministic_and_near_pairs(spark, docs):
    c1 = {r["doc_id"]: r["simhash"] for r in simhash_codes(docs).collect()}
    c2 = {r["doc_id"]: r["simhash"] for r in simhash_codes(docs).collect()}
    assert c1 == c2
    # identical docs → hamming 0 pairs found
    extra = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = simhash_near_pairs(docs.union(extra), max_hamming=0).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    for r in extra.select("doc_id").collect():
        assert any(b == r["doc_id"] for (_, b) in found)


def test_brute_force_topk_vs_numpy(embs):
    k, qids = 5, [0, 1, 2]
    rows = embs.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.round(np.array([r["embedding"] for r in rows], dtype=np.float64) * 10000).astype(np.int64)
    got = brute_force_topk(embs, qids, k=k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
    for q in qids:
        qv = mat[ids == q][0]
        scores = mat @ qv
        mask = ids != q
        order = np.lexsort((ids[mask], -scores[mask]))[:k]
        expect = [(i + 1, int(ids[mask][o]), int(scores[mask][o])) for i, o in enumerate(order)]
        assert sorted(by_q[q]) == expect


def test_topk_matmul_equals_declarative(embs):
    qids = [0, 3, 7]
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"]) for r in brute_force_topk(embs, qids, k=8).collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"]) for r in topk_matmul(embs, qids, k=8).collect()}
    assert a == b


def test_lsh_topk_is_bucket_restricted_and_sane(embs):
    buckets = {r["vec_id"]: r["bucket"] for r in lsh_buckets(embs).collect()}
    out = lsh_topk(embs, [0, 1], k=5).collect()
    for r in out:
        assert buckets[r["neighbor_id"]] == buckets[r["query_id"]]


def test_quality_and_langid_run(docs):
    q = quality_scores(docs)
    assert q.count() == docs.count()
    li = lang_id(docs)
    assert li.count() == docs.count()
    assert set(li.select("pred_lang").distinct().toPandas()["pred_lang"]) <= {
        "de", "en", "es", "fr", "zh",
    }


def test_langid_on_real_stopwords(spark):
    samples = [
        (1, "the cat and the dog of a house that is big"),
        (2, "el perro y la casa de un gato que es grande"),
        (3, "der hund und die katze das ist ein haus zu den"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_doc_fingerprints_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprints(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_multimodal_plumbing(spark):
    from simdgraphprocessing_spark.pipeline import multimodal as mm

    media = mm.make_fake_media(spark, n=30)
    feats = mm.extract_features(media, fake=True, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 8 for r in rows)
    assert mm.verify_media_sha(feats, media) == 0
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, fake=False)
    fs = mm.frame_sample(media, every_ms=400)
    vid = media.filter(F.col("kind") == "video").collect()
    expect = sum(len(range(0, r["duration_ms"], 400)) for r in vid)
    assert fs.count() == expect


def test_embedding_cosine_dups(spark):
    from simdgraphprocessing_spark.pipeline import embedding_cosine_dups

    # v0 ≈ v1 (cos ~ 1, same LSH bucket since signs of plane dots
    # match), v2 orthogonal-ish to both
    rows = [
        (0, [0.5, 0.4, -0.3, 0.2]),
        (1, [0.5, 0.4, -0.3, 0.2]),
        (2, [-0.4, 0.5, 0.3, -0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["a"], r["b"]) for r in embedding_cosine_dups(df, thr_num=9, thr_den=10).collect()
    }
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
    # int columns only (hash-stable across engines)
    row = embedding_cosine_dups(df, thr_num=9, thr_den=10).collect()[0]
    assert row["dot"] == row["na"] == row["nb"]  # identical vectors


def test_minhash_direct_mode_matches_dict_pairs(spark):
    """Production (xxhash64-direct, no dictionary) and oracle (dict)
    MinHash modes must yield the same VERIFIED near-dup pairs — the
    exact-Jaccard verification makes the output invariant to which
    hash family proposed the candidates, as long as banding recall
    holds at the threshold."""
    from simdgraphprocessing_spark.pipeline import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dict_pairs = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    direct_pairs = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8, hash_mode="direct").collect()
    }
    assert dict_pairs == direct_pairs
    assert dict_pairs  # non-trivial fixture
