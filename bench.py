"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: a warm-up pass (JIT/codegen/page cache)
is NOT counted, then a timed pass. The timed action is a full
materialization (count of the result) so every exchange and sink-side
stage runs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from chesscom_etl_tableau_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "j3_star_join",
    "j4_topn_semi",
    "a8_count_by_key",
    "a13_percentiles",
    "w1_rolling_12d",
    "w3_session_stats",
    "f4_top5_by_measure",
    "t1_flatten_nested",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_incremental_exact",
    "corpus_source_overlap",
    "dedup_minhash_lsh",
    "dedup_embed_cosine",
    "dedup_embed_lsh",
    "ann_cosine_topk",
    "mm_decode_features",
    "text_token_stats",
    "text_lang_id",
    "text_bpe_tokens",
    "j5_asof_join",
    "j6_range_join",
    "w5_cube",
    "text_winnow",
    "train_chunks",
    "train_pack",
    "text_tfidf_top5",
    "text_bm25_topk",
    "text_quality_filter",
    "a15_funnel",
    "a16_retention",
    "w6_pivot",
    "w7_sliding_windows",
    "a17_zscore_anomalies",
    "a18_approx_percentiles",
]

# Regression attribution (round-3 verdict ask): a scan-bound query that
# drifts implicates I/O / page cache; a CPU-bound one implicates codegen
# or the Python worker pool. Group subtotals make a drift attributable
# from BENCH_r{N}.json alone, without a profile run.
GROUPS = {
    # dominated by the parquet scan + one narrow shuffle
    "scan_bound": [
        "q1_pricing_summary",
        "j3_star_join",
        "j4_topn_semi",
        "a8_count_by_key",
        "a13_percentiles",
        "w1_rolling_12d",
        "w3_session_stats",
        "f4_top5_by_measure",
        "t1_flatten_nested",
        "dedup_exact",
        "dedup_incremental_exact",
        "ann_cosine_topk",
        "j5_asof_join",
        "w5_cube",
        "train_pack",
        "text_token_stats",
        "a15_funnel",
        "a16_retention",
        "w6_pivot",
        "w7_sliding_windows",
        "a17_zscore_anomalies",
        "a18_approx_percentiles",
    ],
    # dominated by expression / HOF / hash CPU (shingles, signatures,
    # winnowing, tf-idf) or the Arrow Python worker (mm decode)
    "cpu_bound": [
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_embed_cosine",
        "dedup_embed_lsh",
        "corpus_source_overlap",
        "mm_decode_features",
        "text_lang_id",
        "text_bpe_tokens",
        "j6_range_join",
        "text_winnow",
        "train_chunks",
        "text_tfidf_top5",
        "text_bm25_topk",
        "text_quality_filter",
    ],
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # Build the plan once; the warm-up pass exercises codegen/page
        # cache, then median of 5 timed executions (observed box noise
        # spans 13-31s for the same code — the wider sample keeps one
        # contended run from moving the recorded number).
        df = qs[name](spark, sf_dir)
        df.count()  # warm-up (not timed)
        runs = []
        for _ in range(5):
            t0 = time.time()
            df.count()
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[2], 3)
    total = round(sum(timings.values()), 3)
    groups = {
        g: round(sum(timings[q] for q in names if q in timings), 3)
        for g, names in GROUPS.items()
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "groups": groups,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
