"""Similarity search over an embedding column (``array<float>``).

Two physical strategies, one semantic:

* :func:`brute_force_topk` — declarative: quantized integer dot
  products via posexplode + join + sum, ranked per query. Integer
  quantization (round(x·10⁴)) makes scores exact and engine-portable
  (the DuckDB oracle reproduces them bit-for-bit) — floats never
  survive a hash-compare across engines.
* :func:`topk_matmul` — the throughput path: mapInPandas with a
  broadcast numpy query matrix; each Arrow batch does one BLAS
  matmul + argpartition. Same ranking contract (score desc, id asc).
  This is the one to run at 10^9 vectors — the probe side streams,
  the query side broadcasts, no shuffle at all.
* :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane LSH:
  deterministic integer hyperplanes bucket vectors; top-k searches
  only the query's bucket (the IVF-style scale path).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = QUANT,
) -> DataFrame:
    """(vec_id, qvec array<long>) — integer-quantized embedding."""
    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: F.round(x * quant).cast("long")).alias("qvec"),
    )


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, rank, neighbor_id, score) — exact integer-dot top-k.

    Declarative plan: the query set is tiny → broadcast; dims explode
    to (id, pos, val) postings; one join on pos + groupBy — Catalyst
    keeps it all in codegen.
    """
    q = quantize_embeddings(df, vec_col, id_col).filter(F.col(id_col).isin(query_ids))
    base = quantize_embeddings(df, vec_col, id_col)
    qp = q.select(
        F.col(id_col).alias("query_id"), F.posexplode("qvec").alias("pos", "qv")
    )
    bp = base.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("qvec").alias("pos", "bv")
    )
    scores = (
        F.broadcast(qp)
        .join(bp, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qv") * F.col("bv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def topk_matmul(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Same contract as :func:`brute_force_topk`, vectorized:
    broadcast query matrix, per-batch numpy matmul, then a global
    top-k re-rank (each partition emits its local top-k per query —
    correct because global top-k ⊆ union of partition top-ks)."""
    spark = df.sparkSession
    q = quantize_embeddings(df, vec_col, id_col).filter(
        F.col(id_col).isin(query_ids)
    ).collect()
    q_ids = np.array([r[id_col] for r in q], dtype=np.int64)
    q_mat = np.array([r["qvec"] for r in q], dtype=np.int64)
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    base = quantize_embeddings(df, vec_col, id_col)

    def score_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = b_ids.value, b_mat.value
        for pdf in pdfs:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["qvec"].to_numpy())  # (batch, dim) int64
            s = qm @ mat.T  # (nq, batch)
            out = []
            for row, qid in enumerate(qi):
                sc = s[row]
                keep = ids != qid
                order = np.lexsort((ids[keep], -sc[keep]))[:k]
                sel = np.nonzero(keep)[0][order]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[sel],
                            "score": sc[sel],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "score": []}
            )

    partial = base.mapInPandas(
        score_batches, "query_id long, neighbor_id long, score long"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def _hyperplane(kk: int, dim_col):
    """Deterministic integer hyperplane entry in [-3, 3]:
    ((1009·k + 9176·j + 31) mod 7) − 3 at dimension j."""
    return (F.lit(1009 * kk) + F.lit(9176) * dim_col + F.lit(31)) % 7 - 3


def lsh_buckets(
    df: DataFrame, n_planes: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, bucket) — random-hyperplane sign LSH, integer math.

    Fully NARROW plan: each plane's dot product is a higher-order
    ``aggregate`` over ``zip_with(qvec, sequence(...))`` — no
    posexplode, no D-rows-per-vector shuffle, the whole bucket
    assignment is one map stage that scales with the vector count
    alone. Same integer values as the hyperplane formula the DuckDB
    oracle embeds."""
    base = quantize_embeddings(df, vec_col, id_col)
    bucket = None
    row = base

    def _dot_lambda(k):
        return lambda x, j: x * _hyperplane(k, j)

    for kk in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                "qvec",
                F.sequence(F.lit(0).cast("long"), F.size("qvec") - 1),
                _dot_lambda(kk),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        row = row.withColumn(f"d{kk}", dot)
        bit = F.when(F.col(f"d{kk}") > 0, F.lit(1 << kk)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return row.select(F.col(id_col), bucket.cast("long").alias("bucket"))


def embedding_cosine_dups(
    df: DataFrame,
    thr_num: int = 9,
    thr_den: int = 10,
    n_planes: int = 8,
    quant: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(a, b, dot, na, nb) — embedding near-duplicate pairs: cosine ≥
    thr_num/thr_den, candidates restricted to one shared LSH bucket
    (the scale path: the self-join is bucketed, never all-pairs; a
    vector has exactly one bucket, so each pair appears at most once).

    The cosine test is pure int64 arithmetic on quantized vectors —
    ``dot > 0 ∧ thr_den²·dot² ≥ thr_num²·na·nb`` — so the DuckDB
    oracle reproduces it bit-for-bit with no float rounding hazard.

    int64 envelope: the largest term is ``thr_den²·dot²`` (and
    ``thr_num²·na·nb``), so safety requires
    ``thr_den·quant²·Σ|x_i y_i| < √(2^63) ≈ 3.04e9``. At quant=1000,
    dims≤64 that means near-unit coordinates (|x|≤1, giving
    thr_den·dot ≤ 16·6.4e7 ≈ 1.0e9 — safe); |x| up to 3 is NOT safe
    (dot ≤ 5.8e8 ⇒ thr_den·dot ≈ 9.2e9 overflows after squaring —
    Spark with ANSI off would wrap silently while DuckDB errors).
    A runtime assert on the max squared norm enforces the bound.

    Closes the dedup family of the training-pipeline brief: exact /
    MinHash+LSH / SimHash / n-gram Jaccard / **embedding-cosine**.
    """
    buckets = lsh_buckets(df, n_planes, vec_col, id_col)
    q = quantize_embeddings(df, vec_col, id_col, quant=quant)
    base = (
        q.join(buckets, id_col)
        .select(
            F.col(id_col),
            F.col("qvec"),
            F.col("bucket"),
            F.aggregate(
                F.transform("qvec", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("norm2"),
        )
    ).persist()  # both self-join sides read it (bucket+quantize subtree)
    # Overflow guard (see docstring): dot ≤ max(norm2) by Cauchy-Schwarz
    # on same-norm-scale vectors, so requiring
    # (thr_den·max_norm2)² < 2^63 and thr_num²·max_norm2² < 2^63 keeps
    # every comparison term exact. One scalar agg over the persisted
    # base — negligible next to the self-join it protects.
    max_n2 = base.agg(F.max("norm2").alias("m")).collect()[0]["m"] or 0
    bound = max(thr_den, thr_num) * max_n2
    if bound * bound >= 2**63:
        raise ValueError(
            f"embedding_cosine_dups int64 overflow: max norm2={max_n2} with "
            f"thr {thr_num}/{thr_den} exceeds the exact-arithmetic envelope; "
            "lower quant or normalize embeddings"
        )
    l = base.select(
        F.col(id_col).alias("a"), F.col("qvec").alias("qa"),
        F.col("norm2").alias("na"), "bucket",
    )
    r = base.select(
        F.col(id_col).alias("b"), F.col("qvec").alias("qb"),
        F.col("norm2").alias("nb"), "bucket",
    )
    pairs = l.join(r, "bucket").filter(F.col("a") < F.col("b"))
    scored = pairs.select(
        "a", "b",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
        "na", "nb",
    )
    return scored.filter(
        (F.col("dot") > 0)
        & (
            F.lit(thr_den * thr_den) * F.col("dot") * F.col("dot")
            >= F.lit(thr_num * thr_num) * F.col("na") * F.col("nb")
        )
    )


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact integer dot ranking restricted to the
    query's LSH bucket (IVF-style candidate pruning)."""
    buckets = lsh_buckets(df, n_planes, vec_col, id_col)
    base = quantize_embeddings(df, vec_col, id_col).join(buckets, id_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("bucket"),
    )
    cands = F.broadcast(q).join(
        base.select(F.col(id_col).alias("neighbor_id"), F.col("qvec"), F.col("bucket")),
        "bucket",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with("q_qvec", "qvec", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
