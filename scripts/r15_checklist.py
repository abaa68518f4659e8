"""Emit the r15 optimization checklist (plans/r15/CHECKLIST.md): every
registry query, its before/after bench seconds, host-normalized ratio,
and which OPTIMIZATION_r15.md log section covers it.

    python scripts/r15_checklist.py plans/r15/BENCH_full_r15_before.json BENCH_full.json
"""

from __future__ import annotations

import json
import re
import sys

DIRECT = {
    "text_winnow": "§3 numpy winnow (mapInPandas)",
    "train_decontaminate": "§3 (winnow consumer)",
    "a28_pattern_cep": "§4 partition-sorted mapInPandas CEP",
    "a30_cusum": "§4 partition-sorted mapInPandas CUSUM",
    "stream_corpus_ingest": "§2 one-pass near-dedup + shared MinHash",
    "stream_corpus_ingest_mm": "§2 + §1 clustered index writes",
    "stream_corpus_decontam": "§2 + §1",
    "pipeline_forget_ids": "§1 clustered writes + §5 fused counters",
    "dedup_lsh_persist": "§1 clustered partitioned write",
    "dedup_lsh_compact": "§1 + §5 one-job probe equality",
    "dedup_lsh_gen_probe": "§1 + §5",
    "ann_ivf_append": "§1 + §5",
    "ann_ivf_compact": "§1 + §5",
    "ann_ivf_gen_probe": "§1 + §5",
    "ann_ivf_refit": "§1 + §5",
    "ann_ivf_gen_delete": "§1 + §5",
    "ann_ivfpq_append": "§1 + §5 + §7 train-input persist",
    "ann_ivfpq_topk": "§7",
    "ann_ivfpq_refit": "§1 + §7",
    "ann_recall_pq": "§7",
    "emb_pq_error": "§7",
    "stream_ann_enrich": "§1 + §5",
    "stream_sessionize": "§8 vectorized ts + batched emission",
    "stream_pattern_matches": "§8 vectorized ts",
    "graph_bfs": "§6 edge-list persist",
    "i2_idempotent_reingest": "§5 fused counts + §9 fixture pin",
    "i3_open_month_refetch": "§9 fixture pin",
    "i5_incremental_equivalence": "§5 one-job 4-counter agg + §9",
    "s5_append_roundtrip": "§5 fused counts",
    "s6_audit_game_counts": "§9 fixture pin",
    "s9_state_roundtrip": "§9 fixture pin",
    "s20_incremental_agg": "§5 fused counters + one-job equality",
}
LEFT = {
    "dedup_semantic": "left: exact-anchor interpreted cosine (hash-risk to rewrite)",
    "dedup_embed_cosine": "left: exact-anchor cosine (declared O(n²) baseline)",
    "dedup_embed_lsh": "left: exact+LSH contract pair",
    "ann_cosine_topk": "left: exact-anchor cosine",
    "dedup_minhash_lsh": "left: inverted-index join is the algorithm; AQE reuses stages",
    "dedup_ngram_jaccard": "left: same",
    "dedup_containment": "left: same",
    "corpus_source_overlap": "left: same",
    "dedup_incremental_near": "left: same family",
    "dedup_cluster_survivors": "left: jaccard + CC, both audited",
    "dedup_components": "left: same",
    "dedup_substrings_fixpoint": "left: bounded rounds w/ checkpoints (declared)",
    "text_quality_model": "left: spark.ml LR fit floor (model pinned by oracle)",
    "train_bpe_merges": "left: k corpus passes declared; per-round checkpoint",
    "train_bpe_tokenize": "left: same",
    "s7_status_log_counts": "left: per-event durability contract",
    "graph_kcore": "left: per-round checkpoint + early-exit already",
    "graph_pagerank": "left: edges/deg persisted already",
    "graph_jaccard": "left: same",
    "graph_triangles": "left: persisted intermediates already",
    "emb_knn_consistency": "left: bounded pair join (audited r14)",
    "emb_whitening": "left: one-pass cov partials (audited r14)",
    "ann_mmr_rerank": "left: bounded driver greedy (declared)",
    "ann_ivf_kmeans": "left: spark.ml KMeans floor (§7 persist applies)",
    "w8_ntile_deciles": "left: two-pass exact rank is the floor (r8 note)",
}


def main() -> int:
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    ca, cb = a["calibration_sec"], b["calibration_sec"]
    qa, qb = a["queries"], b["queries"]
    lines = [
        "# r15 optimization checklist — every registry query",
        "",
        f"Before: `{a['run_id']}` (calibration {ca}s); after: `{b['run_id']}`"
        f" (calibration {cb}s). `norm` divides each reading by its run's own",
        "calibration before taking the ratio, so box-speed drift between the",
        "two runs does not read as a code change. Sections refer to",
        "OPTIMIZATION_r15.md's per-operator log.",
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
            disp = "left: micro-batch machinery floor (see 'left alone')"
        elif re.match(r"^s1[1-9]|^s22", name):
            disp = "left: manifest write-audit-publish ladder (load-bearing)"
        elif ta is not None and ta < 1.0:
            disp = "examined at family level; sub-second"
        else:
            disp = "examined; no safe structural win found"
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
