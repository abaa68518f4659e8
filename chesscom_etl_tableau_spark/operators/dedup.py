"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The reference dedups by exact key (`game_url`, fetch_and_post.py:358-370
— see plans/ingest.py for that anti-join). These operators extend dedup
to *content* similarity, the LLM-training-data requirement
(BASELINE.json north star).

Scale design:
- Exact dedup: fingerprint -> groupBy. One shuffle on a well-distributed
  md5 key; map-side combine collapses most groups before the exchange.
- N-gram Jaccard: inverted-index self-join on shingles. The classic
  skew hazard is a stop-shingle shared by millions of docs; we drop
  shingles with document-frequency above `max_shingle_df` (standard
  practice, and AQE skew-join splits whatever remains).
- MinHash-LSH: signature = h min-aggregates over the exploded shingles
  (one shuffle); banding -> candidate pairs via an equi-join on
  (band_id, band_hash) — this replaces the O(n^2) pair space with
  bucket-local pairs. Hash family is xxhash64(seed, shingle) min'd as
  a bigint — deterministic, seedable, and cheap (the LSH stage is
  candidate-gen only; the exact-Jaccard verify is engine-portable).
- SimHash: 64 sign-accumulators over token hashes; near-dup candidates
  share a 16-bit band (4-band decomposition tolerates Hamming dist <=3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.text import normalized_fingerprint, word_tokens
from chesscom_etl_tableau_spark.util import ensure_parallelism


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized fingerprint: representative id
    (min), duplicate count. `dup_count > 1` rows are the duplicate sets."""
    return (
        docs.select(F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one doc (min id) per normalized fingerprint.

    Implemented as min-id-per-fingerprint + semi join rather than
    dropDuplicates so the survivor choice is deterministic.
    """
    keep = exact_dup_groups(docs, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact similarity over shingle sets)
# ---------------------------------------------------------------------------
def _doc_shingles(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    # Shingling is the CPU-heavy stage: spread narrow sources first, and
    # bind the token array as a column before the shingle transform so
    # the tokenizer regex runs once per doc, not once per position
    # (Catalyst has no CSE inside higher-order-function lambdas).
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"),
        word_tokens(F.col(text_col)).alias("__toks"),
    )
    from chesscom_etl_tableau_spark.operators.text import shingles_from_tokens

    return toks.select(
        "doc",
        F.explode(shingles_from_tokens(F.col("__toks"), k)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All doc pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    Inverted-index join: |intersection| from the shingle self-join,
    |union| = |A| + |B| - |intersection|. `max_shingle_df` drops
    ubiquitous shingles before the join (skew + cost control at scale).
    """
    sh = _doc_shingles(docs, text_col, id_col, k)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.try_divide(
                    F.col("n_common") * F.lit(1.0),
                    F.col("n_a") + F.col("n_b") - F.col("n_common"),
                ),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate Jaccard at scale)
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature: array of `num_hashes` xxhash64 minima.

    min(xxhash64(seed_i, shingle)) is an order-statistic over a uniform
    hash family — the standard MinHash estimator. One groupBy (single
    shuffle), `num_hashes` min-aggregates computed in the same pass.
    """
    sh = _doc_shingles(docs, text_col, id_col, k)
    # xxhash64(seed_i, shingle) is an order of magnitude cheaper than a
    # cryptographic hash and just as uniform for min-estimation; the
    # min is over bigint instead of a 32-char string.
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc").agg(*mins)
    return sig.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs whose signature agrees on ALL rows of any band.

    Explode each signature into `bands` (band_id, band_key) rows, then
    self-join per bucket. Pairs may match in multiple bands — distinct.
    """
    banded = signatures.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * (F.size("signature") / bands).cast("int") + 1,
                                (F.size("signature") / bands).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                        "|",
                    )
                ),
            )
        ).alias("band_id", "band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact verify.

    The exact-Jaccard verification joins candidate pairs back to their
    shingle sets; candidates are broadcast, so the verify joins stream
    the shingle sets without shuffling them. At very large corpora,
    persist/checkpoint `cands` first and semi-join `docs` down to
    candidate members before re-shingling — as a single lazy plan that
    restructuring recomputes the signature branch and measures slower,
    so it is only worth it with materialization the caller owns.
    """
    sigs = minhash_signatures(docs, text_col, id_col, k, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands)
    sh = _doc_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        cands.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.try_divide(F.col("n_common") * F.lit(1.0), F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """60-bit SimHash per document over word tokens.

    Token hash = xxhash64(token); sign accumulation per bit, bit set
    when the weighted sum is positive. Runs as one groupBy over exploded
    tokens — `bits` sum-aggregates in a single pass.
    """
    if bits > 60:
        bits = 60  # keep the sign bits out of the fingerprint
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(word_tokens(F.col(text_col))).alias("token"),
    )
    # xxhash64 is uniform and ~10x cheaper than md5+base-conversion;
    # shiftright below only ever reads the low `bits` bits.
    toks = toks.select("doc", F.xxhash64(F.col("token")).alias("th"))
    sums = toks.groupBy("doc").agg(
        *[
            F.sum(F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = sums.select(
        "doc",
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint")) for i in range(bits)],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )
    return sim


def simhash_candidates(sim: DataFrame, band_bits: int = 15, bands: int = 4) -> DataFrame:
    """Near-dup candidates: pairs agreeing on any `band_bits`-bit band."""
    banded = sim.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .cast("bigint")
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
