"""Synthetic source-code-repository corpus + import-edge extraction.

Input per ``BASELINE.json`` ``input_hint``: a table
``repos(repo string, path string, commit string, lang string,
content string)``. We synthesize it deterministically (seed folded
into every hash; no RNG state) with power-law structure:

* repo sizes ~ log-uniform (few huge repos, many tiny),
* import fan-out skewed small,
* import *targets* Zipf-concentrated on low file ids → hub files
  imported by thousands (the skew the north rule demands we handle).

Everything is generated with JVM-side column expressions
(``xxhash64`` streams + ``sequence``/``explode``) — no Python loop,
no driver materialization — so the same code synthesizes 10^6 or
10^12 rows given a cluster.

Edge extraction (:func:`extract_edges`) parses ``content`` with
``regexp_extract_all`` (vectorized), resolves ``"repo:path"`` import
strings back to file ids via a join on the file dictionary, and
carries the per-row invariant ``content_sha = sha2(content, 256)``
for equality checks against the source table
(:func:`verify_content_sha`).

This is the ETL stage mirroring the reference's edge-list loaders
(``MutableGraph.hpp:517-599``): parse → dedup → symmetrize happens
downstream in :mod:`simdgraphprocessing_spark.graph`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMPORT_RE = r"^import\s+(\S+)$"
LANGS = ["py", "java", "go", "js", "rs"]


def _u(col, tag: int, seed: int):
    """Deterministic uniform in [0,1) — an xxhash64 stream keyed by tag."""
    return (
        F.pmod(F.xxhash64(col, F.lit(tag), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    )


def file_dictionary(spark: SparkSession, n_files: int, n_repos: int | None = None, seed: int = 42) -> DataFrame:
    """(file_id, repo, path, lang) — the deterministic file universe."""
    if n_repos is None:
        n_repos = max(2, n_files // 10)
    f = spark.range(n_files).withColumnRenamed("id", "file_id")
    # log-uniform repo assignment: sizes ∝ 1/(r+1) (power-law skew)
    repo_idx = F.least(
        F.lit(n_repos - 1),
        (F.exp(_u(F.col("file_id"), 1, seed) * F.log(F.lit(float(n_repos)))) - 1).cast("long"),
    )
    lang_idx = F.pmod(F.xxhash64(F.col("file_id"), F.lit(2), F.lit(seed)), F.lit(len(LANGS)))
    return f.select(
        "file_id",
        F.format_string("repo%05d", repo_idx).alias("repo"),
        F.format_string("src/m%02d/f%d.py", F.pmod(F.col("file_id"), F.lit(97)), F.col("file_id")).alias("path"),
        F.element_at(F.array(*[F.lit(l) for l in LANGS]), (lang_idx + 1).cast("int")).alias("lang"),
    )


def import_pairs(spark: SparkSession, n_files: int, seed: int = 42, max_fanout: int = 40, target_skew: float = 3.0) -> DataFrame:
    """(src_file, dst_file) ground-truth import edges.

    Fan-out per file = floor(max_fanout · u³) (skewed small); each
    target = floor(n_files · v^target_skew) (Zipf toward low ids →
    hub in-degrees). Self-imports are shifted by one.
    """
    f = spark.range(n_files).withColumnRenamed("id", "src_file")
    k = F.floor(F.lit(max_fanout) * F.pow(_u(F.col("src_file"), 3, seed), F.lit(3.0)))
    exploded = (
        f.withColumn("k", k)
        .filter(F.col("k") > 0)
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.col("k"))))
    )
    v = _u(F.xxhash64(F.col("src_file"), F.col("j"), F.lit(seed)), 4, seed)
    target = F.floor(F.lit(n_files) * F.pow(v, F.lit(target_skew)))
    target = F.when(target == F.col("src_file"), (target + 1) % n_files).otherwise(target)
    return exploded.select("src_file", target.cast("long").alias("dst_file")).dropDuplicates()


def make_corpus(spark: SparkSession, n_files: int = 1000, n_repos: int | None = None, seed: int = 42) -> DataFrame:
    """The ``repos`` input table (repo, path, commit, lang, content).

    ``content`` embeds one ``import repo:path`` line per ground-truth
    import edge, plus deterministic filler; ``commit`` is a 40-hex id
    derived from (repo, path, seed).
    """
    files = file_dictionary(spark, n_files, n_repos, seed)
    pairs = import_pairs(spark, n_files, seed)
    targets = files.select(
        F.col("file_id").alias("dst_file"),
        F.concat_ws(":", "repo", "path").alias("import_str"),
    )
    imports = (
        pairs.join(targets, "dst_file")
        .groupBy(F.col("src_file").alias("file_id"))
        .agg(F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list("import_str")), lambda s: F.concat(F.lit("import "), s))
        ).alias("import_block"))
    )
    body = F.format_string(
        "# module f%d\n%s\n\ndef main():\n    return %d\n",
        F.col("file_id"),
        F.coalesce(F.col("import_block"), F.lit("# no imports")),
        F.pmod(F.xxhash64(F.col("file_id"), F.lit(9), F.lit(seed)), F.lit(100000)),
    )
    return (
        files.join(imports, "file_id", "left")
        .select(
            "repo",
            "path",
            F.substring(F.sha2(F.concat_ws("|", "repo", "path", F.lit(str(seed))), 256), 1, 40).alias("commit"),
            "lang",
            body.alias("content"),
        )
    )


def extract_edges(corpus: DataFrame) -> DataFrame:
    """repos table → file-level edge table
    (src bigint, dst bigint, content_sha string).

    Vectorized regex over content (never per-row Python), resolved to
    dense file ids via a self-derived dictionary join (the dictionary
    is V-sized; Spark broadcasts it when small, hash-joins at scale).
    """
    dict_df = corpus.select(
        F.concat_ws(":", "repo", "path").alias("import_str")
    ).distinct().withColumn(
        "file_key", F.xxhash64("import_str")
    )
    src = corpus.select(
        F.concat_ws(":", "repo", "path").alias("src_str"),
        F.sha2("content", 256).alias("content_sha"),
        F.explode(
            F.expr(rf"regexp_extract_all(content, '(?m)^import\\s+(\\S+)$', 1)")
        ).alias("import_str"),
    )
    edges = (
        src.join(dict_df, "import_str")
        .select(
            F.xxhash64("src_str").alias("src"),
            F.col("file_key").alias("dst"),
            "content_sha",
        )
    )
    return edges


def repo_level_edges(corpus: DataFrame) -> DataFrame:
    """Repo-projection: distinct (src_repo, dst_repo) import edges."""
    src = corpus.select(
        F.col("repo").alias("src_repo"),
        F.explode(
            F.expr(rf"regexp_extract_all(content, '(?m)^import\\s+(\\S+)$', 1)")
        ).alias("import_str"),
    )
    return (
        src.withColumn("dst_repo", F.split("import_str", ":").getItem(0))
        .filter(F.col("src_repo") != F.col("dst_repo"))
        .select(
            F.xxhash64("src_repo").alias("src"), F.xxhash64("dst_repo").alias("dst")
        )
        .dropDuplicates()
    )


def verify_content_sha(derived: DataFrame, source: DataFrame) -> int:
    """Per-row invariant (input_hint): every content_sha carried by a
    derived table must exist identically in the source. Returns the
    number of violating rows (0 == pass)."""
    src_sha = source.select(F.sha2("content", 256).alias("content_sha")).distinct()
    return derived.select("content_sha").distinct().join(
        src_sha, "content_sha", "left_anti"
    ).count()
