"""Text-analysis operators for training-data pipelines over the
``documents`` table: tokenization, token counting, quality scoring,
language-ID (stopword heuristic), and document fingerprinting.

All operators are pure column expressions (JVM-side, whole-stage
codegen) — at 100 TB these run inside the parquet scan stage with
zero shuffles except the fingerprint dictionary build.

Tokenization contract (shared with the DuckDB oracles in
``__spark_entry__``): lowercase, split on runs of non-alphanumerics,
drop empties. Keep the two sides in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Minimal per-language stopword profiles for the n-gram/stopword
# language-ID heuristic. Deterministic, ASCII, SQL-expressible.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "ta"],
}

FP_MOD = 1_000_000_007


def tokens_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens)."""
    toks = tokens_col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, distinct_ratio, alpha_ratio, quality)

    A deterministic quality heuristic: enough tokens, vocabulary not
    degenerate, mostly alphabetic. Ratios are exact rationals of the
    same integer operands on both engines → hash-stable doubles.
    """
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n_tok, 6)
    alpha_ratio = F.round(alpha / n_chars, 6)
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        distinct_ratio.alias("distinct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        (
            (n_tok >= 10) & (F.size(F.array_distinct(toks)) / n_tok > 0.2) & (alpha / n_chars > 0.5)
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang) — stopword-ratio language heuristic.

    Scores each language by how many tokens hit its stopword list;
    argmax with alphabetical tie-break (deterministic). Expressed as
    a greatest-of-structs so it stays in codegen.
    """
    toks = tokens_col(text_col)
    scores = [
        F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in ws])))
        .alias(f"score_{lang}")
        for lang, ws in sorted(STOPWORDS.items())
    ]
    scored = docs.select(F.col(id_col), *scores)
    # argmax by (score desc, lang asc): greatest over (score, negated-lang
    # rank) structs; encode lang rank as a small int to keep ordering sane.
    langs = sorted(STOPWORDS)
    structs = [
        F.struct(
            F.col(f"score_{lang}").alias("s"), F.lit(-i).alias("nr"), F.lit(lang).alias("lang")
        )
        for i, lang in enumerate(langs)
    ]
    return scored.select(F.col(id_col), F.greatest(*structs).getField("lang").alias("pred_lang"))


def token_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, tid) — dense ids by token sort order, shared with the
    SQL oracles (dense_rank over ORDER BY token = 1-based row_number
    over the distinct tokens). Ranked with the scalable two-pass
    range-partition scheme, never a single-partition window."""
    from simdgraphprocessing_spark.functions.ranking import global_row_number

    toks = docs.select(F.explode(tokens_col(text_col)).alias("token")).distinct()
    return global_row_number(
        toks, [F.col("token").asc()], out_col="tid", start=1
    ).withColumn("tid", F.col("tid").cast("long"))


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — order-sensitive rolling checksum:
    Σ (pos+1)·tid  mod 1e9+7 over the token stream. Integer-exact,
    so identical across engines; order-sensitive so token swaps
    change it (a cheap Rabin-Karp-style document fingerprint)."""
    d = token_dictionary(docs, text_col)
    pos_tok = docs.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "token")
    )
    return (
        pos_tok.join(F.broadcast(d), "token")
        .groupBy(id_col)
        .agg(
            (F.sum((F.col("pos") + 1) * F.col("tid")) % F.lit(FP_MOD)).alias("fingerprint")
        )
    )
