"""Property-based tests (hypothesis) for parser and dedup invariants
(SURVEY.md §5 rebuild strategy).

Example counts are kept small: each example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.functions.pgn import pgn_result
from chesscom_etl_tableau_spark.operators.dedup import minhash_dedup_pairs, ngram_jaccard_pairs
from chesscom_etl_tableau_spark.operators.sessions import sessionize

RESULTS = ["1-0", "0-1", "1/2-1/2"]
SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


import pytest

# Heavyweight randomized property suites: excluded from the default
# profile (pytest.ini addopts -m "not slow") so the driver's run
# completes; run them with `python -m pytest tests/ -m slow` or the
# full suite with `python -m pytest tests/ -m ""` (r16, VERDICT #1).
pytestmark = pytest.mark.slow



class TestPgnResultPriority:
    @SLOW
    @given(
        header=st.sampled_from(RESULTS + [None]),
        trailing=st.sampled_from(RESULTS + [None]),
        moves=st.text(alphabet="abcdefgh12345678 .Nx+", min_size=0, max_size=40),
    )
    def test_header_beats_trailing_token(self, spark, header, trailing, moves):
        parts = []
        if header is not None:
            parts.append(f'[Result "{header}"]')
        body = moves.replace("\n", " ")
        if trailing is not None:
            body = f"{body} {trailing}"
        parts.append(body)
        pgn = "\n".join(parts)
        out = (
            spark.createDataFrame([(pgn,)], "pgn string")
            .select(pgn_result(F.col("pgn")).alias("r"))
            .first()["r"]
        )
        if header is not None:
            assert out == header
        elif trailing is not None:
            assert out == trailing
        else:
            assert out is None or out == ""


def _docs_strategy():
    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    return st.lists(doc, min_size=2, max_size=8)


class TestDedupInvariants:
    @SLOW
    @given(texts=_docs_strategy())
    def test_minhash_subset_of_exact_jaccard(self, spark, texts):
        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
        }
        approx = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_dedup_pairs(df, k=3, num_hashes=8, bands=4, threshold=0.5).collect()
        }
        # LSH candidates are verified exactly: subset, identical scores.
        assert set(approx) <= set(exact)
        for pair, j in approx.items():
            assert j == exact[pair]


class TestSessionInvariants:
    @SLOW
    @given(
        offsets=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25),
    )
    def test_partition_and_gap_properties(self, spark, offsets):
        base = 1_700_000_000
        rows = [("u", i, base + off) for i, off in enumerate(offsets)]
        df = (
            spark.createDataFrame(rows, "user_id string, event_id int, epoch long")
            .withColumn("ts", F.timestamp_seconds("epoch"))
        )
        out = sessionize(df, gap_minutes=30, tiebreak_cols=("event_id",)).collect()
        # Every event gets exactly one session.
        assert len(out) == len(rows)
        # Within a session: consecutive gaps < 30 min; across session
        # boundaries: gap >= 30 min.
        by_ts = sorted(out, key=lambda r: (r["epoch"], r["event_id"]))
        for prev, cur in zip(by_ts, by_ts[1:]):
            gap = cur["epoch"] - prev["epoch"]
            if cur["session_seq"] == prev["session_seq"]:
                assert gap < 1800
            else:
                assert gap >= 1800
                assert cur["session_seq"] == prev["session_seq"] + 1


class TestTimeControlFuzz:
    @SLOW
    @given(
        tc=st.one_of(
            st.none(),
            st.text(max_size=12),
            st.integers(min_value=0, max_value=100_000).map(str),
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=0, max_value=60),
            ).map(lambda t: f"{t[0]}+{t[1]}"),
            st.integers(min_value=1, max_value=14).map(lambda d: f"1/{d * 86400}"),
        )
    )
    def test_never_errors_and_buckets_consistently(self, spark, tc):
        from chesscom_etl_tableau_spark.functions.time_control import (
            BLITZ_MAX_S,
            BULLET_MAX_S,
            RAPID_MAX_S,
            time_control_bucket,
        )

        out = (
            spark.createDataFrame([(tc,)], "tc string")
            .select(time_control_bucket(F.col("tc")).alias("b"))
            .first()["b"]
        )
        assert out in {"bullet", "blitz", "rapid", "classical", "daily", "unknown"}
        if tc is None:
            assert out == "unknown"
        elif "/" in tc:
            assert out == "daily"
        else:
            base = tc.split("+")[0]
            if base.isdigit() and int(base) < 2**31:
                expected = (
                    "bullet" if int(base) < BULLET_MAX_S
                    else "blitz" if int(base) < BLITZ_MAX_S
                    else "rapid" if int(base) < RAPID_MAX_S
                    else "classical"
                )
                assert out == expected


class TestOhlcInvariants:
    @SLOW
    @given(
        events=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=20_000),  # offset seconds
                st.floats(min_value=-100, max_value=100, allow_nan=False),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_ohlc_matches_sequential_recompute(self, spark, events):
        from chesscom_etl_tableau_spark.operators.windows import resample_ohlc

        base = 1_700_000_000
        rows = [(i, base + off, v) for i, (off, v) in enumerate(events)]
        df = spark.createDataFrame(
            rows, "event_id long, epoch long, value double"
        ).select(
            "event_id",
            F.timestamp_seconds("epoch").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            "value",
        )
        got = {
            r["bucket_start_s"]: r for r in resample_ohlc(df).collect()
        }
        # sequential reference: sort by (ts, event_id), bucket by hour
        buckets: dict[int, list] = {}
        for i, (off, v) in sorted(enumerate(events), key=lambda t: (t[1][0], t[0])):
            b = (base + off) // 3600 * 3600
            buckets.setdefault(b, []).append(v)
        assert set(got) == set(buckets)
        for b, vals in buckets.items():
            r = got[b]
            assert r["open_value"] == vals[0]
            assert r["close_value"] == vals[-1]
            assert r["low_value"] == min(vals)
            assert r["high_value"] == max(vals)
            assert r["n_events"] == len(vals)


class TestKnInvariants:
    @SLOW
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8
            ).map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    def test_kn_matches_python_reference(self, spark, docs):
        from chesscom_etl_tableau_spark.operators.text import kn_perplexity

        import math

        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got = {r["doc_id"]: r for r in kn_perplexity(df).collect()}

        # pure-Python reference of the documented formula
        def toks(t):
            import re as _re

            return _re.findall(r"[a-z0-9]+", t.lower())

        def bigrams(t):
            w = toks(t)
            return list(zip(w, w[1:]))

        from collections import Counter, defaultdict

        c2: Counter = Counter()
        for d, t in enumerate(docs):
            if d % 5 != 0:
                c2.update(bigrams(t))
        c1: Counter = Counter()
        n1r: Counter = Counter()
        n1l: Counter = Counter()
        for (w1, w2), c in c2.items():
            c1[w1] += c
            n1r[w1] += 1
            n1l[w2] += 1
        B = len(c2)
        D = 0.75
        for d, t in enumerate(docs):
            bg = bigrams(t)
            assert got[d]["n_bigrams"] == len(bg)
            if not bg:
                assert got[d]["kn_bits"] == 0.0
                continue
            s = 0
            for w1, w2 in bg:
                pcont = (n1l.get(w2, 0) / B) if B else 0.0
                if w1 in c1:
                    p = (max(c2.get((w1, w2), 0) - D, 0.0) / c1[w1]) + (
                        (D * n1r[w1]) / c1[w1]
                    ) * pcont
                else:
                    p = pcont
                s += math.floor(-math.log2(max(p, 1e-9)) * 1e6 + 0.5)
            expect = math.floor(s / len(bg) + 0.5) / 1e6
            assert got[d]["kn_bits"] == expect


class TestTrainSampleProperties:
    """The sampling contract pq_train/ivf_build_centroids rely on:
    content-determinism (same ids -> same sample regardless of cap
    call order), subset-of-corpus, and exact passthrough at/under the
    cap. Pure-python mirror of the xxhash64-mod filter is impractical
    (Spark's xxhash64 seed), so properties are relational, not
    value-pinned."""

    @SLOW
    @given(
        n=st.integers(min_value=1, max_value=300),
        cap=st.integers(min_value=0, max_value=400),
    )
    def test_sample_relational_properties(self, spark, n, cap):
        import chesscom_etl_tableau_spark.operators.similarity as SIM

        df = spark.range(n).selectExpr("id as vec_id")
        ids = lambda d: sorted(r["vec_id"] for r in d.collect())
        s1 = ids(SIM.train_sample(df, cap=cap, corpus_rows=n, key_col="vec_id"))
        s2 = ids(SIM.train_sample(df, cap=cap, corpus_rows=n, key_col="vec_id"))
        assert s1 == s2  # deterministic
        assert set(s1) <= set(range(n))  # subset
        if cap <= 0 or n <= cap:
            assert len(s1) == n  # exact passthrough
        else:
            # the filter keeps ~n/stride in expectation; it must at
            # least be a strict filter (never grows the corpus)
            assert len(s1) <= n


class TestAsofDirectionProperties:
    """Randomized as-of equivalence vs pandas merge_asof — every
    direction, with and without tolerance, over arbitrary per-user
    event layouts (duplicate left timestamps, equal left/right
    timestamps, empty sides)."""

    @SLOW
    @given(
        lefts=st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 50)),
            min_size=1, max_size=10,
        ),
        rights=st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 50)),
            min_size=0, max_size=10,
        ),
        direction=st.sampled_from(["backward", "forward", "nearest"]),
        tolerance_s=st.sampled_from([None, 5, 20]),
    )
    def test_matches_pandas(self, spark, lefts, rights, direction, tolerance_s):
        import datetime as dt

        import pandas as pd

        from chesscom_etl_tableau_spark.operators.asof import (
            asof_join_directions,
        )

        def ts(s):
            return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)

        # right must be unique per (key, ts): dedup keeping max payload
        rmap = {}
        for u, s in rights:
            rmap[(u, s)] = max(rmap.get((u, s), float("-inf")), float(u * 100 + s))
        left = spark.createDataFrame(
            [(i, u, ts(s)) for i, (u, s) in enumerate(lefts)],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(u, ts(s), v) for (u, s), v in sorted(rmap.items())],
            "user_id long, ts timestamp, v double",
        )
        got = {
            int(r.event_id): (None if r.asof_v is None else float(r.asof_v))
            for r in asof_join_directions(
                left, right, ["user_id"], payload_cols=["v"],
                direction=direction, tolerance_s=tolerance_s,
            ).collect()
        }
        lp = left.toPandas().sort_values(["ts", "event_id"], kind="stable")
        rp = right.toPandas().sort_values("ts", kind="stable")
        kw = {"tolerance": pd.Timedelta(seconds=tolerance_s)} if tolerance_s else {}
        m = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction=direction,
            suffixes=("", "_r"), **kw
        )
        want = {
            int(r.event_id): (None if pd.isna(r.v) else float(r.v))
            for r in m.itertuples()
        }
        assert got == want


class TestShardProperties:
    @SLOW
    @given(
        tokens=st.lists(st.integers(0, 50), min_size=1, max_size=20),
        budget=st.sampled_from([1, 7, 64]),
        width=st.sampled_from([1, 3, 1000]),
    )
    def test_matches_serial_cumsum(self, spark, tokens, budget, width):
        from chesscom_etl_tableau_spark.operators.training import (
            shard_by_token_budget,
        )

        # sparse, shuffled ids — the operator must order by id, not input
        ids = [i * 13 + 5 for i in range(len(tokens))][::-1]
        docs = spark.createDataFrame(
            [(i, "w " * n) for i, n in zip(ids, tokens[::-1])],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.tokens_before, r.shard_id)
            for r in shard_by_token_budget(
                docs, budget=budget, bucket_width=width
            ).collect()
        }
        before = 0
        for i, n in sorted(zip(ids, tokens[::-1])):
            assert got[i] == (n, before, before // budget)
            before += n


class TestBoilerplateAndCoverageProperties:
    """Randomized invariants for the r11 cleaning/measuring pair."""

    @SLOW
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
                min_size=0, max_size=14,
            ).map(" ".join),
            min_size=2, max_size=6,
        ),
        k=st.sampled_from([2, 4]),
    )
    def test_boilerplate_token_conservation(self, spark, texts, k):
        from chesscom_etl_tableau_spark.operators.dedup import (
            remove_boilerplate_spans,
        )

        docs = spark.createDataFrame(
            [(i, "s", t) for i, t in enumerate(texts)],
            "doc_id long, source string, text string",
        )
        for r in remove_boilerplate_spans(docs, k=k, df_frac=0.0).collect():
            n = len(texts[r.doc_id].split()) if texts[r.doc_id] else 0
            # block accounting: every token is in a full block or the tail
            assert r.n_spans == n // k
            assert 0 <= r.n_boiler <= r.n_spans
            kept = len(r.clean_text.split()) if r.clean_text else 0
            # removal drops exactly k tokens per removed block instance
            assert kept == n - r.n_boiler * k

    @SLOW
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=0, max_size=12,
            ).map(" ".join),
            min_size=2, max_size=6,
        ),
        k=st.sampled_from([2, 3]),
    )
    def test_coverage_bounds_and_exact_dup_full_coverage(self, spark, texts, k):
        from chesscom_etl_tableau_spark.operators.dedup import (
            duplicated_substring_coverage,
        )

        # append an exact twin of doc 0 so at least one doc duplicates
        rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), texts[0])]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r
            for r in duplicated_substring_coverage(docs, k=k).collect()
        }
        for i, t in rows:
            n = len(t.split()) if t else 0
            r = got[i]
            assert r.n_tokens == n
            assert 0 <= r.dup_tokens <= n
            assert (r.dup_tokens == 0) == (r.n_islands == 0)
        # the exact twin pair: every window duplicated -> full coverage
        n0 = len(texts[0].split()) if texts[0] else 0
        if n0 >= k:
            assert got[0].dup_tokens == n0
            assert got[len(texts)].dup_tokens == n0
