"""dedup_incremental_near adjudication evidence (r10 verdict ask #1).

Interleaved median-of-7 A/B of the FULL registry entry: shape A (the
current lazy operator — the candidate subtree executes once for the
corpus semi-join and once for the intersection join) vs shape B (the
bounded candidate pair set localCheckpoint'ed before the verify).
Interleaving cancels slow box drift. Measured r11 (idle box, warm
session, sf0.1): A median 1.994s, B median 2.358s — the checkpoint
round-trip costs MORE than the duplicate subtree recompute at this
scale, the same conclusion minhash_dedup_pairs' docstring records for
the non-incremental twin. Shape A stands; the row was re-recorded
(see BASELINE.md "dedup_incremental_near re-baseline (r11)")."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as E
from chesscom_etl_tableau_spark.operators import dedup as D
from chesscom_etl_tableau_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("ab-incnear3")
docs = E._t(spark, SF, "documents")
docs.count()
corpus = docs.where(F.col("doc_id") % 5 != 4)
batch = docs.where(F.col("doc_id") % 5 == 4)


def got_b():
    index = D.dedup_index_frame(corpus)
    bsig = D.minhash_signatures(batch, "text", "doc_id", 3, 16)
    bb = D._banded(bsig, 4).select(F.col("doc").alias("batch_id"), "band_id", "band_key")
    ib = D._banded(index.select(F.col("doc_id").alias("doc"), "signature"), 4).select(
        F.col("doc").alias("corpus_id"), "band_id", "band_key"
    )
    cands = (
        bb.join(ib, ["band_id", "band_key"]).select("batch_id", "corpus_id").distinct()
    ).localCheckpoint(eager=True)
    corpus_c = corpus.join(cands.select(F.col("corpus_id").alias("doc_id")), "doc_id", "left_semi")
    bsh = D._doc_shingles(batch, "text", "doc_id", 3)
    csh = D._doc_shingles(corpus_c, "text", "doc_id", 3)
    b_sizes = bsh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_b"))
    c_sizes = csh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_c"))
    inter = (
        cands.join(bsh.select(F.col("doc").alias("batch_id"), "shingle"), "batch_id")
        .join(csh.select(F.col("doc").alias("corpus_id"), "shingle"), ["corpus_id", "shingle"])
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(b_sizes.select(F.col("doc").alias("batch_id"), "n_b"), "batch_id")
        .join(c_sizes.select(F.col("doc").alias("corpus_id"), "n_c"), "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.try_divide(
                    F.col("n_common") * F.lit(1.0),
                    F.col("n_b") + F.col("n_c") - F.col("n_common"),
                ),
                6,
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("batch_id", "corpus_id", "jaccard")
    )


def full_with(got):
    bsh = D._doc_shingles(batch, "text", "doc_id", 3)
    csh = D._doc_shingles(corpus, "text", "doc_id", 3)
    bs = bsh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_b"))
    cs = csh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_c"))
    inter = (
        bsh.select(F.col("doc").alias("batch_id"), "shingle")
        .join(csh.select(F.col("doc").alias("corpus_id"), "shingle"), "shingle")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        inter.join(bs.select(F.col("doc").alias("batch_id"), "n_b"), "batch_id")
        .join(cs.select(F.col("doc").alias("corpus_id"), "n_c"), "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.try_divide(
                    F.col("n_common") * F.lit(1.0),
                    F.col("n_b") + F.col("n_c") - F.col("n_common"),
                ),
                6,
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("batch_id", "corpus_id", "jaccard")
    )
    return E._lsh_contract(
        exact, got.select("batch_id", "corpus_id"),
        ["batch_id", "corpus_id"], "jaccard", 0.7,
    ).count()


def run_a():
    return E._q_dedup_incremental_near(spark, SF).count()


def run_b():
    return full_with(got_b())


a_times, b_times = [], []
for i in range(7):
    t0 = time.monotonic(); run_a(); a_times.append(time.monotonic() - t0)
    t0 = time.monotonic(); run_b(); b_times.append(time.monotonic() - t0)

print("A (current):", [round(x, 3) for x in a_times], "median", round(statistics.median(a_times), 3))
print("B (ckpt cands):", [round(x, 3) for x in b_times], "median", round(statistics.median(b_times), 3))
