"""Emit the r16 optimization checklist (plans/r16/CHECKLIST.md): every
registry query, its before/after bench seconds, host-normalized ratio,
and which OPTIMIZATION_r16.md log section covers it.

    python scripts/r16_checklist.py plans/r16/BENCH_full_r16_before.json BENCH_full.json
"""

from __future__ import annotations

import json
import re
import sys

DIRECT = {
    # §1 unrolled dot/cosine
    "dedup_embed_cosine": "§1 unrolled dot (pair join)",
    "dedup_embed_lsh": "§1 unrolled dot (band-join verify)",
    "dedup_semantic": "§1 unrolled dot (salted bucket pairs)",
    "emb_knn_consistency": "§1 unrolled dot via cosine_topk(unroll=True)",
    # §2 drain contract frames
    "stream_sessionize": "§2 localCheckpoint contract frame",
    "stream_ohlc": "§2",
    "stream_interval_join": "§2",
    "stream_outer_join": "§2",
    "stream_full_outer_join": "§2",
    "stream_pattern_matches": "§2",
    "stream_dq_report": "§2 (small frame; roundtrip removed)",
    "stream_windowed_counts": "§2 (small frame)",
    "stream_dedup": "§2",
    "stream_scd2": "§2",
    # §3 hygiene (no bench claim)
    "a28_pattern_cep": "§3 null-key run normalization (no perf claim)",
    "a30_cusum": "§3 (same)",
    "i2_idempotent_reingest": "§3 null-safe distinct counter (no perf claim)",
    "s5_append_roundtrip": "§3 (same)",
    "pipeline_forget_ids": "§3 shared victim predicate (no perf claim)",
    "stream_corpus_ingest": "§3 jaccard fold-back refactor (same plan)",
    "stream_corpus_ingest_mm": "§3 (same)",
    "stream_corpus_decontam": "§3 (same)",
}
LEFT = {
    "ann_cosine_topk": "examined §1: unroll REGRESSED at 10k pairs; fold kept",
    "ann_range_search": "examined §1: same",
    "emb_hard_negatives": "examined §1: same",
    "ann_ivfpq_topk": "§5 floor: ~73% pinned spark.ml KMeans fits",
    "ann_ivfpq_append": "§5 floor (same)",
    "ann_ivfpq_refit": "§5 floor (same)",
    "ann_recall_pq": "§5 floor (same)",
    "emb_pq_error": "§5 floor (same)",
    "ann_ivf_kmeans": "§5 floor (same)",
    "text_quality_model": "left: spark.ml LR fit floor (model pinned)",
    "text_tfidf_top5": "§7: partial agg already before exchange; 1-split input",
    "text_bm25_topk": "§7 (same)",
    "dedup_lsh_persist": "§8: MinHash work already spread; writes clustered r15",
    "dedup_lsh_compact": "§8 (same)",
    "dedup_lsh_gen_probe": "§8 (same)",
    "dedup_minhash_lsh": "left: inverted-index join is the algorithm",
    "dedup_ngram_jaccard": "left: same",
    "dedup_containment": "left: same",
    "corpus_source_overlap": "left: same (also the §6 coalescing counter-example)",
    "w1_rolling_12d": "§6: AQE coalescing candidates rejected (net negative)",
    "w3_session_stats": "§6 (same)",
    "w6_pivot": "§6 (same)",
    "w7_sliding_windows": "§6 (same)",
}


def main() -> int:
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    ca, cb = a["calibration_sec"], b["calibration_sec"]
    qa, qb = a["queries"], b["queries"]
    lines = [
        "# r16 optimization checklist — every registry query",
        "",
        f"Before: `{a['run_id']}` (calibration {ca}s); after: `{b['run_id']}`"
        f" (calibration {cb}s). `norm` divides each reading by its run's own",
        "calibration before taking the ratio, so box-speed drift between the",
        "two runs does not read as a code change (this round's before-run was",
        "itself disturbed by mid-run load — see OPTIMIZATION_r16.md; the",
        "interleaved A/Bs in that file are the adopted evidence, this table",
        "is the corroborating sweep). Sections refer to OPTIMIZATION_r16.md.",
        "",
        "| query | before s | after s | norm ratio | disposition |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(set(qa) | set(qb)):
        ta, tb = qa.get(name), qb.get(name)
        if name in DIRECT:
            disp = DIRECT[name]
        elif name in LEFT:
            disp = LEFT[name]
        elif name.startswith("stream_"):
            disp = "left: micro-batch machinery measured §2 (walCommit+offsets ~0.3s/drain)"
        elif re.match(r"^s1[1-9]|^s22", name):
            disp = "left: manifest write-audit-publish ladder (load-bearing)"
        elif ta is not None and ta < 1.0:
            disp = "examined at family level (r15 checklist dispositions stand); sub-second"
        else:
            disp = "examined; r15 disposition stands, no new win found"
        if ta is None or tb is None:
            lines.append(f"| {name} | {ta or '-'} | {tb or '-'} | n/a | {disp} |")
            continue
        ratio = (tb / cb) / (ta / ca) if ta else float("nan")
        lines.append(
            f"| {name} | {ta:.3f} | {tb:.3f} | {ratio:.2f}x | {disp} |"
        )
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
