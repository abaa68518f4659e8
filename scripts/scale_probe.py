"""Scaling probe: dedup operator runtimes at 1x/2x/4x corpus size.

Duplicates the sf0.1 documents/embeddings tables with offset ids (a
dup-heavy corpus, the realistic worst case for near-dup work) and times
each operator. Expectation: inverted-index and LSH paths scale near-
linearly in corpus size + true-pair count; the exact embedding pair
join scales quadratically — which is why it is the baseline, not the
scale path. Run: python scripts/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators import dedup as D
from chesscom_etl_tableau_spark.operators import similarity as SIM
from chesscom_etl_tableau_spark.operators import training as TR
from chesscom_etl_tableau_spark.operators.components import connected_components
from chesscom_etl_tableau_spark.operators.text import winnow_fingerprints
from chesscom_etl_tableau_spark.session import get_spark
from chesscom_etl_tableau_spark.sources.tables import load_table


def components_over_jaccard(docs):
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5).select("doc_a", "doc_b")
    return connected_components(docs.select("doc_id"), pairs)


def replicate(df, id_col, copies):
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(build, docs, emb) -> tuple[float, int]:
    """Times plan construction + execution: iterative operators
    (connected components) do real work at build time via eager
    localCheckpoints, so the build belongs inside the timed region."""
    build(docs, emb).count()  # warm
    t0 = time.time()
    n = build(docs, emb).count()
    return round(time.time() - t0, 2), n


def cc_probe(sf_dir: str) -> None:
    """Star vs propagate connected components on the two graph shapes
    that bracket real dedup workloads (round-3 verdict ask #7):

    - near-clique: jaccard(0.5) pairs over the replicated sf0.1 corpus —
      unions of small dense clusters, diameter 1-2. Propagate's home turf.
    - long chain: n pairwise-chained nodes, diameter n. Propagate needs
      diameter rounds (infeasible past a few hundred — NOT timed, by
      design); star needs O(log² n).

    Prints per-method wall time; star also reports rounds used.
    """
    from chesscom_etl_tableau_spark.operators.components import star_components

    spark = get_spark("cc-probe")
    docs0 = load_table(spark, sf_dir, "documents")

    def run_star(nodes, edges):
        t0 = time.time()
        labels, rounds = star_components(nodes, edges)
        n = labels.select("component_id").distinct().count()
        return round(time.time() - t0, 2), rounds, n

    def run_propagate(nodes, edges):
        t0 = time.time()
        labels = connected_components(nodes, edges)
        n = labels.select("component_id").distinct().count()
        return round(time.time() - t0, 2), n

    print(f"{'graph':<26}{'method':<12}{'x1':>16}{'x4':>16}{'x8':>16}")
    rows = {"propagate": [], "star": []}
    for copies in (1, 4, 8):
        docs = replicate(docs0, "doc_id", copies).cache()
        docs.count()
        pairs = (
            D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
            .select("doc_a", "doc_b")
            .localCheckpoint()  # freeze the edge list: time CC alone
        )
        nodes = docs.select("doc_id")
        sec, ncomp = run_propagate(nodes, pairs)
        rows["propagate"].append(f"{sec:>9.2f}s/{ncomp}")
        sec, rounds, ncomp = run_star(nodes, pairs)
        rows["star"].append(f"{sec:>6.2f}s/r{rounds}/{ncomp}")
        docs.unpersist()
    print(f"{'near-clique(jaccard)':<26}{'propagate':<12}" + "".join(f"{v:>16}" for v in rows["propagate"]))
    print(f"{'near-clique(jaccard)':<26}{'star':<12}" + "".join(f"{v:>16}" for v in rows["star"]))

    star_rows = []
    for n_nodes in (10_000, 40_000, 80_000):
        nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
        edges = (
            spark.range(n_nodes - 1)
            .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
            .repartition(32)
            .localCheckpoint()
        )
        sec, rounds, ncomp = run_star(nodes, edges)
        star_rows.append(f"{sec:>6.2f}s/r{rounds}/{ncomp}")
    print(f"{'chain(10k/40k/80k)':<26}{'star':<12}" + "".join(f"{v:>16}" for v in star_rows))
    print(f"{'chain(10k/40k/80k)':<26}{'propagate':<12}" + "".join(f"{'(diameter rounds)':>16}" for _ in star_rows))


def main() -> None:
    if "--cc" in sys.argv:
        sys.argv.remove("--cc")
        cc_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")

    print(f"{'op':<22}{'x1':>12}{'x2':>12}{'x4':>12}")
    ops = {
        "jaccard(0.5)": lambda d, e: D.ngram_jaccard_pairs(d, k=3, threshold=0.5),
        "minhash_lsh(0.5)": lambda d, e: D.minhash_dedup_pairs(d, k=3, num_hashes=16, bands=4, threshold=0.5),
        "simhash": lambda d, e: D.simhash(d),
        "embed_exact(0.4)": lambda d, e: SIM.embedding_cosine_pairs(e, threshold=0.4),
        "embed_lsh(0.4)": lambda d, e: SIM.embedding_lsh_pairs(e, threshold=0.4),
        "winnow(5,4)": lambda d, e: winnow_fingerprints(d),
        "components": lambda d, e: components_over_jaccard(d),
        "decontaminate": lambda d, e: TR.decontaminate(d, max_df=5),
    }
    for name, build in ops.items():
        row = []
        for copies in (1, 2, 4):
            docs = replicate(docs0, "doc_id", copies).cache()
            emb = replicate(emb0, "vec_id", copies).cache()
            docs.count(), emb.count()
            sec, n = timed(build, docs, emb)
            row.append(f"{sec:>8.2f}s/{n}")
            docs.unpersist(), emb.unpersist()
        print(f"{name:<22}{row[0]:>14}{row[1]:>14}{row[2]:>14}")


if __name__ == "__main__":
    main()
