"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
* exact dedup = hash groupBy on the content hash — one shuffle,
  map-side combine, no skew (hashes are uniform);
* n-gram Jaccard = token-postings self-join — the classic quadratic
  blowup is bounded by dropping ultra-common tokens (df cutoff), the
  same trick as the reference's orientation filter bounding lists;
* MinHash+LSH = signatures via groupBy-min (linear), candidate pairs
  only within LSH band buckets (the scale path — never all-pairs);
* SimHash = integer bit-sketch + hamming filter.

All hash functions are the affine family ``(a·x + b) mod P``
(P = 1,000,003, prime). In the oracle-reproducible dict mode x is a
DICTIONARY token id (dense rank of sorted distinct tokens) so the
DuckDB oracles in ``__spark_entry__`` reproduce the signatures
bit-for-bit; in the production direct mode x is
``pmod(xxhash64(token), P)`` — same family, seeded by one engine hash
per posting instead of a global vocabulary rank, verified by the
final pair set (recall is total at the tested geometry, so both modes
emit exactly the exact-Jaccard pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simdgraphprocessing_spark.pipeline.text import token_dictionary, tokens_col

P = 1_000_003
# deterministic affine hash parameters (seeded once, hard-coded so the
# SQL oracle can embed the same constants)
# Multipliers MUST be O(P): with small multipliers and a small dense
# token-id universe, a·tid+b never wraps mod P, every hash minimizes at
# the smallest tid, and all signatures collapse (perfectly correlated).
MINHASH_AB = [
    (180327, 773957), (689115, 438879), (489715, 858599), (177351, 697369),
    (281323, 94178), (573833, 975624), (762179, 761141), (745731, 786066),
    (561905, 128114), (855775, 450387), (550317, 370799), (264295, 926766),
    (803413, 643866), (462173, 822763), (590887, 443415), (505415, 227239),
    (182923, 554586), (899103, 63818), (872463, 827632), (349085, 631666),
    (248707, 758089), (730473, 354527), (161129, 970699), (501119, 893123),
    (710129, 778385), (783911, 194639), (427517, 466722), (548013, 43804),
    (591913, 154290), (769039, 683050), (930277, 744763), (429979, 967511),
]
SIMHASH_AB = [
    (527177, 782253), (870271, 671488), (192965, 237382), (741341, 179462),
    (865251, 346625), (126247, 152111), (218991, 311430), (949753, 239007),
    (928029, 543558), (941403, 917710), (126769, 444266), (584747, 760285),
    (758903, 575282), (689965, 511885), (138717, 657161), (842683, 946731),
    (500037, 915305), (150925, 720236), (845709, 122755), (341015, 909343),
    (652313, 713283), (382443, 353304), (484237, 221368), (945489, 914080),
    (735459, 815688), (215417, 340314), (748587, 962820), (365133, 683788),
    (521349, 36399), (552675, 384889), (190155, 142087), (364599, 354205),
]


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dupes) — one representative (min id) per distinct
    text, with its duplicate-group size.

    The shuffle key is ``sha2(text, 256)`` (32 bytes), never the text
    itself — at 100 TB a group-by-body would ship the whole corpus
    through the exchange; the hash key makes the shuffle corpus-size-
    independent (collisions are cryptographically negligible)."""
    return docs.groupBy(F.sha2(F.col(text_col), 256).alias("_h")).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("dupes")
    ).select(id_col, "dupes")


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token) distinct token postings."""
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("token")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | None = 1000,
) -> DataFrame:
    """(a, b, jac) — doc pairs with n-gram-set Jaccard ≥ threshold.

    n=1: token sets; n>1: word-shingle sets. The self-join on the
    posting key is the only shuffle; ``max_token_df`` drops postings
    of tokens appearing in more than that many docs (stopword-style
    skew guard — a hub token would otherwise create df² join rows).
    The guard is ON by default (1000): an unguarded postings self-join
    is quadratic in the hottest token's df and must never be the scale
    path — pass ``max_token_df=None`` only for small-corpus oracles.
    Dropping ultra-common tokens can only *miss* pairs whose overlap
    is carried by stopwords; for near-dup thresholds ≥0.5 this is the
    standard trade (same guard as the reference's orientation filter
    bounding neighbor lists).
    """
    if n == 1:
        keyed = _doc_tokens(docs, text_col, id_col).withColumnRenamed("token", "key")
    else:
        toks = tokens_col(text_col)
        shingles = F.expr(
            f"transform(sequence(0, greatest(size(filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')) - {n}, -1)), "
            f"i -> concat_ws(' ', slice(filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != ''), i + 1, {n})))"
        )
        keyed = docs.select(
            F.col(id_col), F.explode(F.array_distinct(shingles)).alias("key")
        )
    if max_token_df:
        hot = keyed.groupBy("key").agg(F.count("*").alias("df")).filter(
            F.col("df") > max_token_df
        )
        keyed = keyed.join(F.broadcast(hot.select("key")), "key", "left_anti")
    # keyed feeds the sizes agg AND both self-join sides — persist or
    # the tokenize/explode subtree runs three times
    keyed = keyed.persist()
    sizes = keyed.groupBy(id_col).agg(F.count("*").alias("sz"))
    l, r = keyed.alias("l"), keyed.alias("r")
    inter = (
        l.join(r, "key")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn("jac", F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 6))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", "jac")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    dictionary: DataFrame | None = None,
    hash_mode: str = "dict",
) -> DataFrame:
    """(doc_id, h0..h{k-1}) — MinHash signature per doc.

    ``hash_mode="dict"`` (oracle mode): h_i = min over tokens of
    (a_i·tid + b_i) mod P over DICTIONARY token ids — bit-for-bit
    reproducible in the DuckDB oracle, but the dictionary build is a
    global rank over the vocabulary (a range shuffle of every distinct
    token).

    ``hash_mode="direct"`` (production mode): the token STRING is
    hashed ONCE per posting (``pmod(xxhash64(token), P)``) and the k
    signature slots are k affine permutations of that single value —
    ``h_i = min over tokens of (a_i·pmod(xxhash64(token),P)+b_i) mod
    P``, the same ``MINHASH_AB`` family dict mode applies to dictionary
    ranks, just seeded by the hash instead of the rank. No dictionary,
    no vocabulary shuffle, and exactly one string-hash evaluation per
    posting row: rounds 3-4 evaluated ``xxhash64(i, token)`` k times
    per posting (k independent aggregate trees — benched SLOWER than
    the dict oracle two rounds running, 38.8 s vs 29.2 s in the
    round-4 driver bench), and round 5's first fix still hashed the
    string k times inside one array expression. Affine-deriving from
    one 64-bit hash is the standard MinHash construction; ``a·h+b``
    stays < P² ≈ 10¹² — no int64 wrap. The hash compresses tokens into
    [0, P) exactly like dict mode's ``mod P`` over ranks, so the
    collision profile (and LSH recall) is the same family.
    The groupBy is also a deliberate MATERIALIZATION BARRIER: an
    in-place per-doc signature (no explode, no shuffle) was measured
    at 71 s end-to-end because Catalyst's projection collapse re-expands
    each unevaluated h_i expression once per referencing LSH band
    column — re-tokenizing every document 32×. The aggregate output
    columns are plain attributes, so banding fan-out above it can
    never re-evaluate them; the shuffle it costs is doc-count-sized
    (k longs per doc after map-side partial min) — corpus-size-
    independent, the 100 TB path. Direct signatures differ from dict
    mode, but LSH recall is equivalent and the verified near-dup PAIRS
    match (tested), because verification always recomputes exact
    Jaccard on candidates.
    """
    if hash_mode == "direct":
        postings = _doc_tokens(docs, text_col, id_col)
        withh = postings.select(
            F.col(id_col),
            F.pmod(F.xxhash64(F.col("token")), F.lit(P)).alias("hm"),
        )
        aggs = [
            F.min((F.lit(a) * F.col("hm") + F.lit(b)) % F.lit(P)).alias(f"h{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
        ]
        return withh.groupBy(id_col).agg(*aggs)
    if dictionary is None:
        dictionary = token_dictionary(docs, text_col)
    postings = _doc_tokens(docs, text_col, id_col).join(
        F.broadcast(dictionary), "token"
    )
    aggs = [
        F.min((F.lit(a) * F.col("tid") + F.lit(b)) % F.lit(P)).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return postings.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "dict",
) -> DataFrame:
    """(a, b, jac) near-dup pairs: LSH banding proposes candidates
    (pairs agreeing on ALL rows of ≥1 band), token Jaccard verifies.

    Scale path: candidates come from groupBy(band, band-values) —
    never an all-pairs product. Verification joins only candidates.
    ``hash_mode="direct"`` drops the token dictionary entirely (see
    :func:`minhash_signatures`) — the production configuration at
    100 TB; "dict" stays the oracle-reproducible default.
    """
    rows = num_hashes // bands
    # persisted: the band table feeds BOTH sides of the self-join —
    # unpersisted, Spark recomputes the whole signature subtree
    # (postings ⋈ dictionary ⋈ 32 min-aggs) once per side and again
    # under the verification diamond (measured 142s → 16s at sf0.1)
    sigs = minhash_signatures(docs, num_hashes, text_col, id_col, hash_mode=hash_mode)
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"h{bi * rows + r}").alias(f"r{r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(bi).alias("band"), *cols).alias(f"b{bi}"))
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).persist()
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(r, "bk")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )
    # verification touches ONLY candidate pairs (the whole point of
    # LSH): join each side's distinct-token array onto the candidate
    # list and compute exact Jaccard with array_intersect — never the
    # all-pairs postings self-join, whose cost is quadratic in the
    # hottest token's document frequency. The token table is doc-count
    # sized (tiny next to the candidate-pair stream), so broadcast it:
    # candidate pairs then verify map-side with zero pair shuffling.
    # Beyond ~10^6 docs drop the broadcast and this becomes two hash
    # joins — same plan shape the optimizer picks on its own.
    toks = F.broadcast(
        docs.select(
            F.col(id_col), F.array_distinct(tokens_col(text_col)).alias("toks")
        )
    )
    verified = (
        cands.join(
            toks.select(F.col(id_col).alias("a"), F.col("toks").alias("ta")), "a"
        )
        .join(toks.select(F.col(id_col).alias("b"), F.col("toks").alias("tb")), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("ta", "tb")).alias("i"),
            F.size("ta").alias("sa"),
            F.size("tb").alias("sb"),
        )
        .withColumn(
            "jac", F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 6)
        )
    )
    return verified.filter(F.col("jac") >= threshold).select("a", "b", "jac")


def simhash_codes(
    docs: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, simhash) — bit b set iff Σ_tokens (2·((a_b·tid+c_b)
    mod P mod 2) − 1) > 0. Distinct-token weights (set semantics)."""
    if dictionary is None:
        dictionary = token_dictionary(docs, text_col)
    postings = _doc_tokens(docs, text_col, id_col).join(
        F.broadcast(dictionary), "token"
    )
    bit_aggs = [
        F.sum(
            2 * (((F.lit(a) * F.col("tid") + F.lit(b)) % F.lit(P)) % 2) - 1
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(SIMHASH_AB[:bits])
    ]
    summed = postings.groupBy(id_col).agg(*bit_aggs)
    code = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        code = bit if code is None else code + bit
    return summed.select(F.col(id_col), code.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, hamming) — pairs within hamming distance.

    Blocked all-pairs via 4 byte-bands of the code (any pair within
    hamming ≤ 3 of a 32-bit code agrees exactly on ≥1 of 4 bytes —
    pigeonhole), so the join is bucketed, not quadratic.
    """
    codes = simhash_codes(docs, bits, text_col, id_col)
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    banded = codes.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(F.lit(mask)).alias("v"),
                )
                for i in range(n_bands)
            ])
        ).alias("bk"),
    ).persist()  # both self-join sides read it; see minhash_lsh_pairs
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, "bk")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
