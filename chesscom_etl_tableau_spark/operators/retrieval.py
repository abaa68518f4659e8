"""Hybrid retrieval: reciprocal-rank fusion of lexical + vector rankers.

The standard RAG/corpus-curation retrieval stack runs BOTH a lexical
ranker (BM25, `operators/text.py`) and a vector ranker (cosine top-k,
`operators/similarity.py`) and fuses them with reciprocal-rank fusion
(Cormack et al., SIGIR'09): ``score(d) = sum_r 1/(rrf_k + rank_r(d))``
over the rankers that returned d. RRF needs no score calibration
between rankers — only ranks — which is why it is the default fusion
in production hybrid search (Elastic, Vespa, OpenSearch all ship it).

Scale shape: each ranker already reduces the corpus to a top-N
candidate list (TakeOrderedAndProject / per-query window), so fusion
operates on |rankers| x N rows — broadcast-join territory regardless
of corpus size. The expensive work stays inside the rankers, which
carry their own 100 TB arguments (BM25: scan + two tiny broadcasts;
cosine: brute top-k baseline or the IVF/LSH scale paths beside it).

Determinism: ranks come in deterministic (both rankers break ties on
id), fused scores are rounded half-up at 1e-6 before the final
ordering, and the final top-k breaks ties on id ascending. Absent
ranks are reported as 0 (sentinel, "not in this ranker's candidates")
rather than NULL so downstream schemas stay non-nullable-int clean.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    top_k: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fuse named ranked candidate lists by reciprocal-rank fusion.

    Each entry of `ranked` is ``(name, df)`` where df carries `id_col`
    and a 1-based `rank_col`. Returns the fused top_k:
    ``(id_col, <name>_rank ... per ranker, rrf_score)`` with absent
    ranks as 0 and rrf_score rounded at 1e-6.

    `group_cols` generalizes to fleet retrieval: each ranked list then
    carries per-group ranks (e.g. a query_id from a per-query window)
    and fusion + top_k happen independently per group in the SAME
    single exchange — the batch-of-queries shape a retrieval service
    actually runs, with no per-query driver loop.
    """
    if len(ranked) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    # Union + pivot-style agg rather than chained FULL OUTER joins:
    # Spark cannot broadcast a full-outer join, so the join form plans
    # a SortMergeJoin even on tiny candidate lists — and at N rankers
    # it pays N-1 shuffles. The union form is ONE exchange on id, no
    # join, for any number of rankers.
    tagged = [
        df.select(
            *[F.col(g) for g in group_cols],
            F.col(id_col),
            F.lit(name).alias("__ranker"),
            F.col(rank_col).cast("int").alias("__rank"),
        )
        for name, df in ranked
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    per_ranker = [
        F.max(F.when(F.col("__ranker") == name, F.col("__rank"))).alias(
            f"{name}_rank"
        )
        for name, _ in ranked
    ]
    fused = u.groupBy(*group_cols, id_col).agg(*per_ranker)
    contribs = [
        F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        for name, _ in ranked
    ]
    score = reduce(lambda a, b: a + b, contribs)
    scored = fused.withColumn(
        "rrf_score",
        F.floor(score * F.lit(1000000.0) + F.lit(0.5)).cast("double")
        / F.lit(1000000.0),
    ).select(
        *[F.col(g) for g in group_cols],
        F.col(id_col),
        *[
            F.coalesce(F.col(f"{name}_rank"), F.lit(0)).alias(f"{name}_rank")
            for name, _ in ranked
        ],
        F.col("rrf_score"),
    )
    order = [F.col("rrf_score").desc(), F.col(id_col).asc()]
    if not group_cols:
        # global top-k: TakeOrderedAndProject, no full sort
        return scored.orderBy(*order).limit(top_k)
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_k)
        .drop("__rn")
    )


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    candidates: int = 50,
    rrf_k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """BM25 + cosine hybrid retrieval over an aligned corpus
    (documents.doc_id == embeddings.vec_id), fused with RRF.

    The lexical query is `query_terms`; the vector query is the
    embedding of `query_vec_id` (self-match excluded by the ranker).
    Returns ``(doc_id, bm25_rank, cos_rank, rrf_score)`` top_k.
    """
    from chesscom_etl_tableau_spark.operators.similarity import cosine_topk
    from chesscom_etl_tableau_spark.operators.text import bm25_topk

    bm = bm25_topk(docs, query_terms, top_k=candidates)
    # bm25_topk emits an ordered list without an explicit rank column;
    # number it on the already-tiny candidate set (single partition of
    # <= `candidates` rows — the global window is deliberate and cheap).
    bm_ranked = bm.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    ).select("doc_id", "rank")
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cos = cosine_topk(emb, q, k=candidates).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(
        [("bm25", bm_ranked), ("cos", cos)], rrf_k=rrf_k, top_k=top_k
    )
