"""Round-12 operators: duplicated-substring REMOVAL (the apply twin of
r11's coverage measure — ExactSubstr-remove of the Lee et al. pipeline)
and incremental IVF index append (frozen-centroid assignment, new
partition files only, drift statistic)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.dedup import (
    duplicated_substring_coverage,
    remove_duplicated_substrings,
)
from chesscom_etl_tableau_spark.operators.similarity import (
    assign_buckets,
    ivf_append,
    ivf_bucket_residuals,
    ivf_persist,
)
from chesscom_etl_tableau_spark.operators.text import word_tokens

SF_DIR = "/root/testdata/sf0.001"

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


class TestRemoveDuplicatedSubstrings:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    """Fixture vocabulary is disjoint outside the shared run, so no
    cross-cut window can collide — the regime where the one-pass
    apply IS the fixpoint and the Lee et al. properties hold exactly."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, f"d1a d1b d1c {SHARED} d1x d1y"),
                (2, f"d2a d2b {SHARED} d2z"),
                (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
                (4, "tiny doc here"),
                (5, ""),
            ],
            "doc_id long, text string",
        )

    def _clean(self, spark, docs):
        return remove_duplicated_substrings(docs).select(
            "doc_id", F.col("clean_text").alias("text")
        )

    def test_removes_shared_run_keeps_rest(self, spark):
        got = {
            r["doc_id"]: r
            for r in remove_duplicated_substrings(self._docs(spark)).collect()
        }
        assert got[1]["clean_text"] == "d1a d1b d1c d1x d1y"
        assert got[2]["clean_text"] == "d2a d2b d2z"
        assert got[1]["n_tokens"] == 15 and got[1]["kept_tokens"] == 5
        assert got[2]["n_tokens"] == 13 and got[2]["kept_tokens"] == 3
        # untouched docs byte-preserved (token-normalized unit)
        assert got[3]["clean_text"] == "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"
        assert got[4]["clean_text"] == "tiny doc here"
        assert got[5]["clean_text"] == "" and got[5]["n_tokens"] == 0

    def test_output_coverage_is_zero(self, spark):
        cleaned = self._clean(spark, self._docs(spark))
        cov = duplicated_substring_coverage(cleaned).collect()
        assert all(r["dup_tokens"] == 0 for r in cov)

    def test_idempotent(self, spark):
        once = self._clean(spark, self._docs(spark))
        twice = self._clean(spark, once)
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b

    def test_twin_consistency_on_testdata(self, spark):
        # kept_tokens + coverage.dup_tokens == n_tokens for every doc —
        # the shared _dup_window_islands kernel makes the twins agree
        # by construction; this pins it against a future refactor.
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rem = remove_duplicated_substrings(docs).select(
            "doc_id", "n_tokens", "kept_tokens"
        )
        cov = duplicated_substring_coverage(docs).select(
            "doc_id", F.col("n_tokens").alias("n2"), "dup_tokens"
        )
        j = rem.join(cov, "doc_id")
        bad = j.where(
            (F.col("n_tokens") != F.col("n2"))
            | (F.col("kept_tokens") + F.col("dup_tokens") != F.col("n_tokens"))
        ).count()
        assert bad == 0
        # the fixture corpus actually exercises removal
        assert j.where(F.col("kept_tokens") < F.col("n_tokens")).count() > 0

    def test_whole_doc_duplicated(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
            "doc_id long, text string",
        )
        got = remove_duplicated_substrings(docs).collect()
        assert all(r["clean_text"] == "" and r["kept_tokens"] == 0 for r in got)


class TestIvfAppend:
    def _frames(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        centroids = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        return emb, centroids

    def test_append_equals_rebuild_and_only_new_files(self, spark, tmp_path):
        emb, centroids = self._frames(spark)
        base = emb.where(F.col("vec_id") % 3 != 0)
        batch = emb.where(F.col("vec_id") % 3 == 0)
        path = str(tmp_path / "ivf")
        ivf_persist(base, centroids, path)

        def data_files():
            out = {}
            for root, _, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        out[p] = os.path.getmtime(p)
            return out

        before = data_files()
        drift = ivf_append(spark, path, centroids, batch)
        drift_rows = {r["bucket"]: r for r in drift.collect()}
        after = data_files()
        # incremental contract: every pre-existing file survives
        # untouched; the append only ADDS files
        assert set(before) <= set(after)
        for p, mt in before.items():
            assert after[p] == mt, f"existing index file rewritten: {p}"
        assert len(after) > len(before)

        # appended index row-identical to a from-scratch rebuild on the
        # same frozen centroids
        idx = spark.read.parquet(path).select(
            "vec_id", F.col("bucket").cast("int").alias("bucket")
        )
        reb = assign_buckets(emb, centroids).select(
            "vec_id", F.col("bucket").cast("int").alias("bucket")
        )
        assert idx.exceptAll(reb).count() == 0
        assert reb.exceptAll(idx).count() == 0

        # drift frame covers exactly the batch, bucket by bucket
        batch_assign = assign_buckets(batch, centroids)
        want = {
            r["bucket"]: r["n"]
            for r in batch_assign.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {b: r["n_vectors"] for b, r in drift_rows.items()} == want

    def test_drift_statistic_flags_shifted_batch(self, spark, tmp_path):
        # a batch far from every centroid must read a larger mean
        # residual than the in-distribution build rows — the refit
        # signal the operator exists to emit
        emb, centroids = self._frames(spark)
        base = emb.where(F.col("vec_id") % 3 != 0)
        path = str(tmp_path / "ivf")
        ivf_persist(base, centroids, path)
        base_resid = ivf_bucket_residuals(
            assign_buckets(base, centroids), centroids
        )
        base_mean = base_resid.agg(
            F.expr("sum(mean_resid_micro * n_vectors) div sum(n_vectors)")
        ).first()[0]
        shifted = emb.where(F.col("vec_id") % 3 == 0).select(
            "vec_id",
            F.transform("embedding", lambda v: -v).alias("embedding"),
        )
        drift = ivf_append(spark, path, centroids, shifted)
        drift_mean = drift.agg(
            F.expr("sum(mean_resid_micro * n_vectors) div sum(n_vectors)")
        ).first()[0]
        assert drift_mean > base_mean

    def test_empty_batch_is_noop(self, spark, tmp_path):
        emb, centroids = self._frames(spark)
        base = emb.where(F.col("vec_id") % 3 != 0)
        path = str(tmp_path / "ivf")
        ivf_persist(base, centroids, path)
        n0 = spark.read.parquet(path).count()
        drift = ivf_append(
            spark, path, centroids, emb.where(F.lit(False))
        )
        assert drift.count() == 0
        assert spark.read.parquet(path).count() == n0


class TestInterleaveMultimodal:
    def _docs(self, spark):
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def _stream(self, spark, budget):
        from chesscom_etl_tableau_spark.operators.training import (
            interleave_multimodal_samples,
        )

        return (
            interleave_multimodal_samples(self._docs(spark), budget=budget)
            .toPandas()
            .sort_values(["sample_id", "position"])
            .reset_index(drop=True)
        )

    def test_budget_invariance(self, spark):
        # for ANY budget, (sample_id, position) order reproduces the
        # same corpus item stream — assembly only draws boundaries
        streams = {b: list(self._stream(spark, b)["ref"]) for b in (512, 2048, 10**6)}
        assert streams[512] == streams[2048] == streams[10**6]
        assert len(streams[512]) > 0

    def test_doc_order_and_image_leads(self, spark):
        out = self._stream(spark, 2048)
        import pandas as pd

        for doc_id, g in out.groupby("doc_id", sort=False):
            g = g.sort_values(["sample_id", "position"])
            refs = list(g["ref"])
            has_img = doc_id % 4 == 2
            if has_img:
                assert refs[0] == f"{doc_id}#img"
                assert g.iloc[0]["modality"] == "image"
                assert g.iloc[0]["n_cost_tokens"] == 64
                body = refs[1:]
            else:
                assert all(m == "text" for m in g["modality"])
                body = refs
            # text chunks contiguous and in order
            assert body == [f"{doc_id}#c{j}" for j in range(len(body))]
            # chunk costs: all full except possibly the last
            costs = list(g[g["modality"] == "text"]["n_cost_tokens"])
            assert all(c == 256 for c in costs[:-1])
            if costs:
                assert 1 <= costs[-1] <= 256
        # a doc's items never interleave with another doc's
        block_starts = out["doc_id"].ne(out["doc_id"].shift()).cumsum()
        assert out.groupby("doc_id")["doc_id"].count().sum() == len(out)
        assert block_starts.groupby(out["doc_id"]).nunique().max() == 1

    def test_sample_assignment_is_prefix_sum(self, spark):
        budget = 2048
        out = self._stream(spark, budget)
        before = out["n_cost_tokens"].cumsum().shift(1, fill_value=0)
        assert (out["sample_id"] == before // budget).all()
        # positions are a clean 0..k-1 run per sample
        for _, g in out.groupby("sample_id"):
            assert list(g["position"]) == list(range(len(g)))


class TestGapFillInterpolate:
    def test_linear_between_brackets(self, spark):
        import datetime as dt

        from chesscom_etl_tableau_spark.operators.windows import (
            gap_fill_interpolate,
        )

        d0 = dt.datetime(2024, 1, 1, 5, 0, 0)  # in-day time: tick = date_trunc
        rows = [
            (1, d0, 10.0),
            (1, d0 + dt.timedelta(days=3), 40.0),
            (1, d0 + dt.timedelta(days=5), 40.0),
            (2, d0, 7.5),  # single observation -> single tick
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = {
            (r["user_id"], r["tick"].day): (r["value_filled"], r["is_observed"])
            for r in gap_fill_interpolate(df, "user_id", "ts", "value", "1 day").collect()
        }
        assert got[(1, 1)] == (10.0, True)
        assert got[(1, 2)] == (20.0, False)   # 10 + 30 * 1/3
        assert got[(1, 3)] == (30.0, False)   # 10 + 30 * 2/3
        assert got[(1, 4)] == (40.0, True)
        assert got[(1, 5)] == (40.0, False)   # flat bracket
        assert got[(1, 6)] == (40.0, True)
        assert got[(2, 1)] == (7.5, True)
        assert len(got) == 7

    def test_observed_values_pass_through(self, spark):
        from chesscom_etl_tableau_spark.operators.windows import (
            gap_fill_interpolate,
            gap_fill_locf,
        )

        from chesscom_etl_tableau_spark.sources.tables import load_table

        ev = load_table(spark, SF_DIR, "events").where(
            F.col("event_type") == "purchase"
        ).select("user_id", "ts", "value")
        interp = gap_fill_interpolate(ev, "user_id", "ts", "value", "1 day")
        locf = gap_fill_locf(ev, "user_id", "ts", "value", "1 day")
        # on OBSERVED ticks the two twins agree exactly (micro-floor of
        # the raw value vs the raw value: compare micro-floored)
        j = interp.where("is_observed").alias("i").join(
            locf.where("is_observed").alias("l"),
            ["user_id", "tick"],
        )
        bad = j.where(
            F.floor(F.col("i.value_filled") * 1e6 + 0.5)
            != F.floor(F.col("l.value_filled") * 1e6 + 0.5)
        ).count()
        assert bad == 0


class TestCapSourceTokens:
    def test_quality_first_admission_with_straddler(self, spark):
        from chesscom_etl_tableau_spark.operators.training import (
            cap_source_tokens,
        )

        rows = [
            # source A: quality order is d3 (0.9), d1 (0.8), d2 (0.2)
            (1, "A", 40, 0.8),
            (2, "A", 50, 0.2),
            (3, "A", 80, 0.9),
            # source B: one huge doc straddles the cap alone
            (4, "B", 500, 0.5),
            (5, "B", 10, 0.4),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long, quality_score double"
        )
        got = {
            r["doc_id"]: r
            for r in cap_source_tokens(df, cap=100).collect()
        }
        # A admits d3 (before=0), d1 (before=80, straddles past 100 -> kept),
        # then d2 (before=120 >= 100 -> rejected)
        assert got[3]["kept"] and got[3]["tokens_before"] == 0
        assert got[1]["kept"] and got[1]["tokens_before"] == 80
        assert not got[2]["kept"] and got[2]["tokens_before"] == 120
        # B admits the straddler, rejects the rest
        assert got[4]["kept"] and not got[5]["kept"]

    def test_tie_breaks_on_id(self, spark):
        from chesscom_etl_tableau_spark.operators.training import (
            cap_source_tokens,
        )

        rows = [(i, "A", 60, 0.5) for i in (3, 1, 2)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long, quality_score double"
        )
        got = {r["doc_id"]: r["kept"] for r in cap_source_tokens(df, cap=100).collect()}
        assert got == {1: True, 2: True, 3: False}


class TestPatchStats:
    def test_matches_closed_form(self, spark):
        # independent recomputation from the GIF pixel formula (NOT via
        # the decoder): lum(y, x) = (255 + (3*((id + y*w + x) % 256))
        # % 256) // 3 — a decoder or bounds bug diverges.
        from chesscom_etl_tableau_spark.operators.multimodal import (
            synth_patch_stats,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(2, 40, 4)], "doc_id long"
        )
        got = {
            (r["doc_id"], r["patch_row"], r["patch_col"]): (
                r["n_px"],
                r["mean_lum"],
            )
            for r in synth_patch_stats(docs).collect()
        }
        assert len(got) == 10 * 16
        for doc_id in range(2, 40, 4):
            w, h = 8 + doc_id % 24, 8 + (doc_id * 3) % 24
            for i in range(4):
                for j in range(4):
                    y0, y1 = i * h // 4, (i + 1) * h // 4
                    x0, x1 = j * w // 4, (j + 1) * w // 4
                    lums = [
                        (255 + (3 * ((doc_id + y * w + x) % 256)) % 256) // 3
                        for y in range(y0, y1)
                        for x in range(x0, x1)
                    ]
                    assert got[(doc_id, i, j)] == (
                        len(lums),
                        sum(lums) // len(lums),
                    ), (doc_id, i, j)

    def test_patch_counts_tile_image(self, spark):
        from chesscom_etl_tableau_spark.operators.multimodal import (
            synth_patch_stats,
        )

        docs = spark.createDataFrame([(6,), (10,)], "doc_id long")
        out = synth_patch_stats(docs).groupBy("doc_id").agg(
            F.sum("n_px").alias("total"), F.count(F.lit(1)).alias("n")
        )
        for r in out.collect():
            w, h = 8 + r["doc_id"] % 24, 8 + (r["doc_id"] * 3) % 24
            assert r["total"] == w * h and r["n"] == 16


class TestIvfPqAppend:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def test_only_new_files_and_codes_match_rebuild(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.operators.similarity import (
            ivfpq_append,
            ivfpq_persist,
            pq_encode,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = emb.where(F.col("vec_id") % 3 != 0)
        batch = emb.where(F.col("vec_id") % 3 == 0)
        path = str(tmp_path / "ivfpq")
        cents, books = ivfpq_persist(
            base, path, nlist=4, m=4, k=8, seed=42,
            ivf_max_iter=4, pq_max_iter=4,
        )

        def files():
            out = {}
            for root, _, fs in os.walk(path):
                for f in fs:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        out[p] = os.path.getmtime(p)
            return out

        before = files()
        drift = ivfpq_append(spark, path, cents, books, batch)
        n_app = drift.agg(F.sum("n_appended")).first()[0]
        after = files()
        assert set(before) <= set(after) and len(after) > len(before)
        for p, mt in before.items():
            assert after[p] == mt
        assert n_app == batch.count()
        # every error is non-negative and finite
        assert drift.where(F.col("mean_sqerr_micro") < 0).count() == 0

        # appended code table == re-encode of the full corpus on the
        # same frozen quantizers
        from chesscom_etl_tableau_spark.operators.similarity import (
            assign_buckets,
        )

        idx = spark.read.parquet(path).select(
            "vec_id", F.col("bucket").cast("int").alias("bucket"), "codes"
        )
        reb_res = assign_buckets(emb, cents).join(
            F.broadcast(
                cents.select(
                    F.col("centroid_id").alias("bucket"),
                    F.col("embedding").cast("array<double>").alias("__cvec"),
                )
            ),
            "bucket",
        ).select(
            "vec_id",
            "bucket",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("__cvec"),
                lambda x, c: x - c,
            ).alias("__res"),
        )
        reb = pq_encode(
            reb_res, books, id_col="vec_id", vec_col="__res", keep=("bucket",)
        ).select("vec_id", F.col("bucket").cast("int").alias("bucket"), "codes")
        assert idx.exceptAll(reb).count() == 0
        assert reb.exceptAll(idx).count() == 0


class TestLshIndexPersist:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def _split(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return docs.where(F.col("doc_id") % 5 != 4), docs.where(
            F.col("doc_id") % 5 == 4
        )

    def test_pruned_probe_equals_memory_and_partition_filters(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.operators.dedup import (
            _banded,
            _pb,
            lsh_candidates_persisted,
            lsh_index_persist,
            minhash_signatures,
        )

        corpus, batch = self._split(spark)
        path = str(tmp_path / "lsh")
        lsh_index_persist(corpus, path)

        got = lsh_candidates_persisted(spark, path, batch)
        # probe plan prunes partitions on pb
        needed = sorted(
            r["pb"]
            for r in _banded(minhash_signatures(batch), 4)
            .withColumn("pb", _pb(64))
            .select("pb")
            .distinct()
            .collect()
        )
        idx = spark.read.parquet(path).where(F.col("pb").isin(needed))
        plan = idx._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "pb" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

        # pruned persisted probe == in-memory band join, pair for pair
        bb = _banded(minhash_signatures(batch), 4).select(
            F.col("doc").alias("batch_id"), "band_id", "band_key"
        )
        ib = _banded(minhash_signatures(corpus), 4).select(
            F.col("doc").alias("index_id"), "band_id", "band_key"
        )
        mem = (
            bb.join(ib, ["band_id", "band_key"])
            .where(F.col("batch_id") != F.col("index_id"))
            .select("batch_id", "index_id")
            .distinct()
        )
        assert got.exceptAll(mem).count() == 0
        assert mem.exceptAll(got).count() == 0
        assert got.count() > 0

    def test_append_only_new_files_and_equals_rebuild(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.operators.dedup import (
            lsh_index_append,
            lsh_index_persist,
        )

        corpus, batch = self._split(spark)
        path = str(tmp_path / "lsh")
        lsh_index_persist(corpus, path)

        def files():
            out = {}
            for root, _, fs in os.walk(path):
                for f in fs:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        out[p] = os.path.getmtime(p)
            return out

        before = files()
        delta = lsh_index_append(spark, path, batch)
        n_app = delta.agg(F.sum("n_appended")).first()[0]
        after = files()
        assert set(before) <= set(after) and len(after) > len(before)
        for p, mt in before.items():
            assert after[p] == mt
        # appended index == rebuild from the union (signatures are a
        # pure function of text — no trained state)
        path2 = str(tmp_path / "lsh2")
        lsh_index_persist(corpus.unionByName(batch), path2)
        a = spark.read.parquet(path).select("doc", "band_id", "band_key", "pb")
        b = spark.read.parquet(path2).select("doc", "band_id", "band_key", "pb")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        # every batch doc contributed exactly `bands` rows
        assert n_app == batch.count() * 4


class TestRemovalAgainstReference:
    """Randomized (seeded) corpora from a tiny vocabulary — maximal
    window collisions — checked exactly against an independent pure-
    Python implementation of windows -> df -> merged islands ->
    position complement. Catches island-merge and boundary edge cases
    the handwritten fixtures cannot enumerate."""

    @staticmethod
    def _reference(texts: dict[int, str], k: int = 8):
        toks = {i: t.split() for i, t in texts.items()}
        windows: dict[str, set[int]] = {}
        for i, w in toks.items():
            for s in range(len(w) - k + 1):
                windows.setdefault(" ".join(w[s : s + k]), set()).add(i)
        dup = {s for s, docs in windows.items() if len(docs) >= 2}
        out = {}
        for i, w in toks.items():
            starts = sorted(
                s + 1  # 1-based
                for s in range(len(w) - k + 1)
                if " ".join(w[s : s + k]) in dup
            )
            covered: set[int] = set()
            for s in starts:
                covered.update(range(s, s + k))
            kept = [w[p - 1] for p in range(1, len(w) + 1) if p not in covered]
            out[i] = (len(w), len(kept), " ".join(kept))
        return out

    def test_matches_reference_on_random_corpora(self, spark):
        import random

        rng = random.Random(1234)
        vocab = [f"w{j}" for j in range(6)]  # tiny vocab -> heavy collisions
        for trial in range(4):
            texts = {
                i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
                for i in range(12)
            }
            docs = spark.createDataFrame(
                list(texts.items()), "doc_id long, text string"
            )
            got = {
                r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["clean_text"])
                for r in remove_duplicated_substrings(docs).collect()
            }
            want = self._reference(texts)
            assert got == want, f"trial {trial}: {got} != {want}"

    def test_interleave_matches_serial_reference(self, spark):
        import random

        from chesscom_etl_tableau_spark.operators.training import (
            interleave_multimodal_samples,
        )

        rng = random.Random(99)
        texts = {
            i: " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(0, 700)))
            for i in range(40)
        }
        docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        got = (
            interleave_multimodal_samples(docs, budget=512)
            .toPandas()
            .sort_values(["sample_id", "position"])
            .reset_index(drop=True)
        )
        # serial reference: walk docs in id order, emit items, cumsum
        stream = []
        for i in sorted(texts):
            n = len(texts[i].split())
            if i % 4 == 2:
                stream.append((i, "image", 64, f"{i}#img"))
            for j in range((n + 255) // 256):
                stream.append((i, "text", min(256, n - j * 256), f"{i}#c{j}"))
        before = 0
        want = []
        pos: dict[int, int] = {}
        for doc, mod, cost, ref in stream:
            sid = before // 512
            p = pos.get(sid, 0)
            pos[sid] = p + 1
            want.append((sid, p, mod, ref, cost, doc))
            before += cost
        got_rows = list(
            got[
                ["sample_id", "position", "modality", "ref", "n_cost_tokens", "doc_id"]
            ].itertuples(index=False, name=None)
        )
        assert got_rows == want
