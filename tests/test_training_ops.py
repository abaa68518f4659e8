"""Unit tests for training-data preparation operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.training import (
    assign_split,
    chunk_sliding,
    pack_by_token_budget,
    redact_pii,
    tfidf_top_terms,
)


class TestAssignSplit:
    def test_deterministic_and_roughly_proportional(self, spark):
        docs = spark.createDataFrame([(i, "x") for i in range(2000)], "doc_id long, text string")
        out1 = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
        out2 = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
        assert out1 == out2  # reproducible
        n = len(out1)
        frac_train = sum(1 for v in out1.values() if v == "train") / n
        frac_val = sum(1 for v in out1.values() if v == "val") / n
        assert 0.75 < frac_train < 0.85
        assert 0.07 < frac_val < 0.13

    def test_sequential_ids_decorrelated(self, spark):
        # consecutive ids must not land in the same split en bloc.
        docs = spark.createDataFrame([(i, "x") for i in range(100)], "doc_id long, text string")
        splits = [r["split"] for r in assign_split(docs).orderBy("doc_id").collect()]
        runs = sum(1 for a, b in zip(splits, splits[1:]) if a != b)
        assert runs > 20  # heavy alternation, not blocks


class TestChunkSliding:
    def test_cover_and_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(100))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        chunks = sorted(
            chunk_sliding(docs, chunk_tokens=64, stride=48).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert len(chunks) == 2
        c0, c1 = (r["chunk_text"].split(" ") for r in chunks)
        assert c0[0] == "w0" and len(c0) == 64
        assert c1[0] == "w48" and c1[-1] == "w99"  # stride start, covers tail
        assert chunks[1]["n_chunk_tokens"] == 52

    def test_short_doc_single_chunk(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        out = chunk_sliding(docs, chunk_tokens=64, stride=48).collect()
        assert len(out) == 1 and out[0]["n_chunk_tokens"] == 3

    def test_empty_doc_no_chunks(self, spark):
        docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
        assert chunk_sliding(docs).count() == 0


class TestPackByBudget:
    def test_cumulative_binning(self, spark):
        # 3 docs of 300 tokens each, budget 512: prefix sums 0/300/600 ->
        # packs 0, 0, 1.
        rows = [(i, "s", " ".join("t" for _ in range(300))) for i in (1, 2, 3)]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r["doc_id"]: r["pack_id"] for r in pack_by_token_budget(docs, budget=512).collect()}
        assert out == {1: 0, 2: 0, 3: 1}

    def test_groups_independent(self, spark):
        rows = [
            (1, "a", "x " * 400),
            (2, "b", "x " * 400),  # different source: pack ids restart
        ]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {(r["source"], r["pack_id"]) for r in pack_by_token_budget(docs, budget=512).collect()}
        assert out == {("a", 0), ("b", 0)}


class TestRedactPii:
    def test_masks_and_counts(self, spark):
        text = "mail bob@example.com or call +1 (555) 123-4567, card 1234567890123456"
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = redact_pii(docs).collect()[0]
        assert r["n_emails"] == 1
        assert r["n_phones"] == 1
        assert "<EMAIL>" in r["redacted_text"]
        assert "<PHONE>" in r["redacted_text"]
        assert "<NUMBER>" in r["redacted_text"]
        assert "example.com" not in r["redacted_text"]
        assert "555" not in r["redacted_text"]

    def test_clean_text_untouched(self, spark):
        docs = spark.createDataFrame([(1, "just words here")], "doc_id long, text string")
        r = redact_pii(docs).collect()[0]
        assert r["redacted_text"] == "just words here"
        assert (r["n_emails"], r["n_phones"], r["n_long_digit_runs"]) == (0, 0, 0)


class TestTfidfTopTerms:
    def test_rare_term_outranks_common(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "common rare common common"),
                (2, "common common"),
                (3, "common stuff"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(docs, top_n=2).collect()
        doc1 = sorted([r for r in out if r["doc_id"] == 1], key=lambda r: r["rank"])
        # 'common' tf=3 with df=3 (idf=1) -> 3.0; 'rare' tf=1 df=1
        # idf=ln(4/2)+1 ~ 1.693 -> common still wins on tf weight.
        assert doc1[0]["term"] == "common"
        assert doc1[1]["term"] == "rare"
        expected_rare = math.floor(1 * (math.log(4 / 2) + 1) * 1e6 + 0.5) / 1e6
        assert doc1[1]["tfidf"] == expected_rare

    def test_top_n_and_rank_bounds(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id long, text string"
        )
        out = tfidf_top_terms(docs, top_n=5).collect()
        assert len(out) == 5
        assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]


class TestMixtureSample:
    def test_weights_respected(self, spark):
        rows = [(i, src, "x") for i in range(3000) for src in ("keep", "half", "drop")]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        from chesscom_etl_tableau_spark.operators.training import mixture_sample

        out = mixture_sample(docs, {"half": 0.5, "drop": 0.0}).groupBy("source").count()
        counts = {r["source"]: r["count"] for r in out.collect()}
        assert counts["keep"] == 3000
        assert "drop" not in counts
        assert 1300 < counts["half"] < 1700

    def test_composes_with_split(self, spark):
        # Same hash function as assign_split: sampling keeps every
        # bucket below the threshold, so the retained set of a 50%
        # mixture is exactly the lower half of split buckets — the
        # sample is split-stratified by construction.
        from chesscom_etl_tableau_spark.operators.training import (
            assign_split,
            mixture_sample,
            split_bucket,
        )
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(i, "s", "x") for i in range(1000)], "doc_id long, source string, text string"
        )
        kept = mixture_sample(docs, {"s": 0.5})
        buckets = [r[0] for r in kept.select(split_bucket(F.col("doc_id"), 10000)).collect()]
        assert max(buckets) < 5000


class TestStratifiedSample:
    def test_exact_n_per_group_and_deterministic(self, spark):
        from chesscom_etl_tableau_spark.operators.training import stratified_sample

        rows = [(i, f"g{i % 4}") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        s1 = {(r["source"], r["doc_id"]) for r in stratified_sample(df, 7).collect()}
        s2 = {(r["source"], r["doc_id"]) for r in stratified_sample(df, 7).collect()}
        assert s1 == s2
        per_group = {}
        for src, _ in s1:
            per_group[src] = per_group.get(src, 0) + 1
        assert per_group == {f"g{i}": 7 for i in range(4)}

    def test_small_group_returned_whole(self, spark):
        from chesscom_etl_tableau_spark.operators.training import stratified_sample

        df = spark.createDataFrame([(1, "tiny"), (2, "tiny")], "doc_id long, source string")
        assert stratified_sample(df, 5).count() == 2


class TestLabelCentroids:
    def test_known_mean(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import label_centroids

        emb = spark.createDataFrame(
            [(1, [1.0, -2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
            "vec_id long, embedding array<float>, label int",
        )
        out = {(r["label"], r["pos"]): r["centroid_val"] for r in label_centroids(emb).collect()}
        assert out == {(0, 0): 2.0, (0, 1): 1.0, (1, 0): 10.0, (1, 1): 20.0}


class TestQuantizeInt8:
    def test_roundtrip_error_bounded(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import quantize_int8

        emb = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        rows = quantize_int8(emb).collect()
        by = {(r["vec_id"], r["pos"]): r for r in rows}
        assert by[(1, 0)]["qval"] == 127  # max |v| maps to 127
        assert by[(1, 1)]["qval"] == -63  # floor(-63.5+0.5) = -63
        assert all(-128 <= r["qval"] <= 127 for r in rows)
        assert all(r["qval"] == 0 for r in rows if r["vec_id"] == 2)  # zero vector safe
        # dequantized error <= scale/2 per element
        r = by[(1, 2)]
        assert abs(r["qval"] * r["scale"] - 0.25) <= r["scale"] / 2 + 1e-9


class TestRepetitionScore:
    def test_repeated_grams_scored(self, spark):
        from chesscom_etl_tableau_spark.operators.text import repetition_score

        docs = spark.createDataFrame(
            [(1, "a b c a b c a b c"), (2, "all unique words right here"), (3, "x y")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in repetition_score(docs, k=3).collect()}
        # 9 tokens -> 7 grams, 3 distinct -> (7-3)/7
        assert out[1]["n_kgrams"] == 7 and out[1]["n_distinct_kgrams"] == 3
        assert abs(out[1]["rep_ratio"] - 4 / 7) < 1e-6
        assert out[2]["rep_ratio"] == 0.0
        assert out[3]["n_kgrams"] == 0 and out[3]["rep_ratio"] == 0.0


class TestDecontaminate:
    def test_cross_split_leak_detected(self, spark):
        from chesscom_etl_tableau_spark.operators.training import assign_split, decontaminate

        leak = "the stolen benchmark answer string nobody else has seen anywhere"
        rows = [
            (0, f"train doc containing {leak} verbatim"),   # train (bucket<80)
            (1, "zqxv wubnol pkarma trellith ongoro"),  # train, no 8-char overlap
            (11, f"test doc containing {leak} verbatim"),    # test
            (22, "fyrrwen dekloba shimzut vontakke pruiell"),  # test
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # sanity: the fixture ids land in the intended splits
        splits = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
        assert splits[0] == "train" and splits[11] == "test"
        out = decontaminate(docs, max_df=3, min_shared=2).collect()
        pairs = {(r["train_id"], r["test_id"]) for r in out}
        assert (0, 11) in pairs
        assert all(p == (0, 11) for p in pairs)

    def test_clean_corpus_empty(self, spark):
        from chesscom_etl_tableau_spark.operators.training import decontaminate

        rows = [(i, f"completely distinct document number {i} talking about topic{i}") for i in (0, 1, 11, 22)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        assert decontaminate(docs, max_df=2, min_shared=2).count() == 0
