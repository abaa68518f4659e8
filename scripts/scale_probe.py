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


def main() -> None:
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
