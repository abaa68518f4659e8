"""Round-7 operator semantics: A/B test summary, CUSUM change-points,
kNN label consistency, per-dimension PSI drift. Oracle parity at 3 SFs
lives in ORACLE_r7*.json via scripts/check_oracle.py; these tests pin
the math on constructed inputs where the right answer is computable by
hand (or a trusted dense reference)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.analytics import (
    ab_test_summary,
    cusum_changepoints,
)
from chesscom_etl_tableau_spark.operators.similarity import (
    knn_label_consistency,
    psi_drift,
)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


class TestAbTestSummary:
    def _outcomes(self, spark):
        rows = [
            ("control", True, 1.0),
            ("control", True, 2.0),
            ("control", False, 3.0),
            ("control", False, 4.0),
            ("treatment", True, 2.0),
            ("treatment", True, 3.0),
            ("treatment", True, 4.0),
            ("treatment", False, 9.0),
        ]
        return spark.createDataFrame(rows, "variant string, converted boolean, value double")

    def test_matches_hand_computation(self, spark):
        row = ab_test_summary(self._outcomes(spark)).collect()[0]
        assert (row["n_control"], row["n_treatment"]) == (4, 4)
        assert (row["conv_control"], row["conv_treatment"]) == (2, 3)
        assert row["rate_control"] == 0.5 and row["rate_treatment"] == 0.75
        # pooled two-proportion z
        p = 5 / 8
        z = (0.75 - 0.5) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
        assert row["z_conversion"] == _r6(z)
        # Welch t on the value metric
        mc, mt = 2.5, 4.5
        s2c = (sum(v * v for v in [1, 2, 3, 4]) - 10 * 10 / 4) / 3
        s2t = (sum(v * v for v in [2, 3, 4, 9]) - 18 * 18 / 4) / 3
        t = (mt - mc) / math.sqrt(s2c / 4 + s2t / 4)
        assert row["mean_value_control"] == 2.5
        assert row["mean_value_treatment"] == 4.5
        assert row["welch_t_value"] == _r6(t)
        assert row["rel_lift"] == 0.5

    def test_missing_variant_yields_null_stats_not_crash(self, spark):
        only_c = self._outcomes(spark).where(F.col("variant") == "control")
        row = ab_test_summary(only_c).collect()[0]
        assert row["n_treatment"] == 0 and row["z_conversion"] is None


class TestCusumChangepoints:
    def _series(self, spark, vals):
        rows = [
            (i, 1, f"2024-01-01T00:{i:02d}:00", float(v)) for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value")

    def test_up_then_down_shift(self, spark):
        # target 5, slack 0.5: flat 5s contribute -0.5/step (clamped at
        # 0); the jump to 10 adds +4.5/step -> crosses h=6 on the 2nd
        # high sample (s+ = 9); the drop to 0 adds +4.5/step on the
        # negative side -> crosses again 2 samples later.
        vals = [5, 5, 5, 10, 10, 0, 0, 5]
        out = sorted(
            (r["direction"], r["change_ts"].minute, r["stat"])
            for r in cusum_changepoints(
                self._series(spark, vals), target=5.0, slack=0.5, threshold=6.0
            ).collect()
        )
        assert out == [("down", 6, 9.0), ("up", 4, 9.0)]

    def test_reset_after_emission(self, spark):
        # after the up-emission both sides reset: an immediately
        # following stable stretch emits nothing more
        vals = [10, 10, 5, 5, 5, 5]
        out = cusum_changepoints(
            self._series(spark, vals), target=5.0, slack=0.5, threshold=6.0
        ).collect()
        assert len(out) == 1 and out[0]["direction"] == "up"

    def test_fence_trips(self, spark):
        with pytest.raises(ValueError, match="cusum_changepoints"):
            cusum_changepoints(
                self._series(spark, [5] * 20),
                target=5.0,
                slack=0.5,
                threshold=6.0,
                max_events_per_key=10,
            )

    def test_rejects_nonpositive_threshold(self, spark):
        with pytest.raises(ValueError, match="threshold"):
            cusum_changepoints(self._series(spark, [1]), 0.0, 0.0, 0.0)


class TestKnnLabelConsistency:
    def test_mislabeled_point_scores_zero(self, spark):
        # two tight clusters; vector 4 sits in cluster A but carries
        # cluster B's label -> with k=2 its neighbors disagree fully,
        # and every correctly-labeled A point keeps agreement 1.0
        # (its k=2 nearest are the other A members, mislabeled or not —
        # vec 4 shares their geometry, so exclude it from expectation).
        rows = [
            (1, [1.0, 0.0, 0.01], 0),
            (2, [0.99, 0.01, 0.0], 0),
            (3, [0.98, 0.0, 0.02], 0),
            (4, [1.0, 0.01, 0.01], 1),  # mislabeled
            (5, [0.0, 1.0, 0.0], 1),
            (6, [0.01, 0.99, 0.0], 1),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        got = {r["vec_id"]: r for r in knn_label_consistency(emb, k=2).collect()}
        assert got[4]["n_same"] == 0 and got[4]["agreement"] == 0.0
        assert got[5]["agreement"] == 0.5  # nearest are 6 (same) and a cluster-A vec
        assert got[1]["agreement"] in (0.5, 1.0)  # mislabeled 4 may intrude
        assert all(0.0 <= r["agreement"] <= 1.0 for r in got.values())

    def test_agreement_is_exact_fraction(self, spark):
        rows = [(i, [float(i), 1.0], i % 2) for i in range(1, 8)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        for r in knn_label_consistency(emb, k=3).collect():
            assert r["agreement"] == _r6(r["n_same"] / 3)


class TestPsiDrift:
    def test_identical_halves_are_stable_and_shift_is_flagged(self, spark):
        import random

        rng = random.Random(11)
        # dim 0 drifts by +2 sigma in B; dim 1 is identically distributed
        a = [(i, [rng.gauss(0, 1), rng.gauss(5, 2)]) for i in range(400)]
        b = [(i, [rng.gauss(2, 1), rng.gauss(5, 2)]) for i in range(400, 800)]
        mk = lambda rows: spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["dim"]: r["psi"] for r in psi_drift(mk(a), mk(b)).collect()}
        assert set(out) == {0, 1}
        assert out[0] > 0.25  # conventional "drifted" band
        assert out[1] < 0.1  # conventional "stable" band

    def test_constant_dimension_is_safe(self, spark):
        mk = lambda rows: spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = mk([(i, [1.0, float(i)]) for i in range(20)])
        b = mk([(i, [1.0, float(i)]) for i in range(20, 40)])
        out = {r["dim"]: r["psi"] for r in psi_drift(a, b).collect()}
        assert out[0] == 0.0  # min == max -> single bin, identical shares
