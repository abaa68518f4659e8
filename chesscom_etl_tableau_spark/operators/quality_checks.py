"""Relational data-quality validation report.

The training-data counterpart of document-level quality filtering
(`operators/text.py` C4/Gopher gate): before a corpus or fact table
feeds a pipeline, validate the RELATIONAL contract — key uniqueness,
referential integrity, accepted value sets, null rates, numeric
ranges, freshness. One report row per rule:

    (rule, metric, threshold, passed)

so the report itself is a stable, oracle-checkable table and a
fail-fast gate (`assert report.where(~passed).count() == 0`) rather
than a log line. Inspired by the Great Expectations / dbt-test rule
vocabulary, re-expressed as Spark aggregates.

Scale shape: every row-level rule over one table fuses into a SINGLE
aggregate pass (conditional sums inside one agg — the scan is paid
once no matter how many rules), each referential rule is one
broadcast-dim left-anti count, and the report union is a handful of
1-row frames. At 100 TB: one fact scan + one tiny broadcast per
referenced dim; nothing shuffles on fact grain.

Determinism: metrics are exact counts/ratios (ratios rounded half-up
at 1e-6); thresholds are caller literals echoed into the report.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _r6(col):
    return (F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0))


def dq_report(
    df: DataFrame,
    unique_keys: list[str] = (),
    accepted_values: dict[str, list] | None = None,
    non_negative: list[str] = (),
    max_null_rate: dict[str, float] | None = None,
    references: list[tuple[str, DataFrame, str]] = (),
    fresh_after: dict[str, str] | None = None,
) -> DataFrame:
    """Build the rule report for `df`.

    - unique_keys: each column must have zero duplicate values
      (metric: duplicated-key count; threshold 0).
    - accepted_values: column -> allowed literals (metric: violation
      count incl. NULLs; threshold 0).
    - non_negative: numeric columns with no value < 0 (metric:
      violation count; threshold 0).
    - max_null_rate: column -> max allowed null fraction (metric:
      observed rate, 1e-6-rounded).
    - references: (fk_col, dim_df, pk_col) — every non-null fk must
      exist in the dim (metric: orphan count; threshold 0).
    - fresh_after: ts/date column -> ISO literal; max(col) must be
      strictly after it (metric: days from literal to max, threshold 0
      meaning "newer than the bound").
    """
    accepted_values = accepted_values or {}
    max_null_rate = max_null_rate or {}
    fresh_after = fresh_after or {}

    aggs, rules = [], []
    total = F.count(F.lit(1))
    for c in unique_keys:
        aggs.append((total - F.countDistinct(F.col(c))).cast("double"))
        rules.append((f"unique:{c}", 0.0))
    for c, allowed in accepted_values.items():
        # NULL is a violation too: a bare ~isin() yields NULL for NULL
        # input, which sum() would silently skip.
        aggs.append(
            F.sum(
                (F.col(c).isNull() | ~F.col(c).isin(list(allowed))).cast("int")
            ).cast("double")
        )
        rules.append((f"accepted:{c}", 0.0))
    for c in non_negative:
        aggs.append(F.sum((F.col(c) < 0).cast("int")).cast("double"))
        rules.append((f"non_negative:{c}", 0.0))
    for c, rate in max_null_rate.items():
        aggs.append(
            _r6(F.sum(F.col(c).isNull().cast("int")) / total)
        )
        rules.append((f"null_rate:{c}", float(rate)))
    for c, bound in fresh_after.items():
        aggs.append(
            F.datediff(F.max(F.col(c)), F.lit(bound).cast("timestamp"))
            .cast("double")
        )
        rules.append((f"fresh_after:{c}", 0.0))

    reports = []
    if aggs:
        # ONE aggregate row -> explode into rule rows. A UNION of
        # per-rule projections over the same agg does NOT get
        # common-subexpression-eliminated by Catalyst — each branch
        # would rescan the fact table (measured: 5 rules = 5 scans).
        # The explode keeps the scan count at exactly one.
        one = df.agg(*[a.alias(f"__m{i}") for i, a in enumerate(aggs)])
        entries = []
        for i, (rule, thr) in enumerate(rules):
            passed = (
                F.col(f"__m{i}") > F.lit(thr)
                if rule.startswith("fresh_after:")
                else F.col(f"__m{i}") <= F.lit(thr)
            )
            entries.append(
                F.struct(
                    F.lit(rule).alias("rule"),
                    F.col(f"__m{i}").alias("metric"),
                    F.lit(thr).alias("threshold"),
                    passed.alias("passed"),
                )
            )
        reports.append(
            one.select(F.explode(F.array(*entries)).alias("__e")).select("__e.*")
        )
    for fk, dim, pk in references:
        orphans = (
            df.where(F.col(fk).isNotNull())
            .join(F.broadcast(dim.select(F.col(pk))), df[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        )
        reports.append(
            orphans.select(
                F.lit(f"references:{fk}->{pk}").alias("rule"),
                F.col("metric"),
                F.lit(0.0).alias("threshold"),
                (F.col("metric") <= 0).alias("passed"),
            )
        )
    if not reports:
        raise ValueError("dq_report needs at least one rule")
    return reduce(lambda a, b: a.unionByName(b), reports)


def observe_metrics(df: DataFrame, name: str, metrics: dict[str, "F.Column"]):
    """Attach ZERO-COST data-quality metrics to a DataFrame via
    Spark's observed-metrics API (`Dataset.observe`).

    `dq_report` pays one dedicated scan for its report; `observe`
    pays NONE — the named aggregates are accumulated by the executors
    DURING whatever action the caller was going to run anyway (the
    production write, the export, the downstream agg). That is the
    100 TB-shaped monitoring primitive: auditing a petabyte write
    costs zero extra reads.

    Returns ``(observed_df, observation)``: run any action on
    `observed_df`, then ``observation.get`` yields the metric dict.
    The metrics must be aggregate expressions (same rules as
    `df.agg`). Works in batch; for streams use
    `streaming/dq_stream.py` (foreachBatch report) instead —
    `Observation` is batch-only, streaming observe needs the listener
    API.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    return observed, obs


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level reconciliation between two versions of a table — the
    audit step after a backfill, migration, or engine swap ("does the
    rewritten table match production, and where not?").

    Emits one row per DIFFERING key: (key..., diff_status) with status
    `added` (right only), `removed` (left only), or `changed` (both
    sides, any compared column differs null-safely). Identical keys
    produce nothing, so the output is |differences|, not |table| —
    the property that makes the audit shippable at 100 TB (a clean
    reconciliation is one empty exchange).

    One full-outer hash join on the keys; column compares are
    null-safe (`<=>`) so NULL vs NULL is equal and NULL vs value is a
    change. `compare_cols` defaults to every shared non-key column.
    Float columns compare by exact bits like any other value — pass
    pre-rounded columns if tolerance is wanted (tolerance is a policy,
    not something a diff should invent).
    """
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    l = left.select(
        *[F.col(k) for k in key_cols],
        F.lit(True).alias("__l"),
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    r = right.select(
        *[F.col(k) for k in key_cols],
        F.lit(True).alias("__r"),
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    joined = l.join(r, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(F.col("__r").isNull(), F.lit("removed"))
        .when(F.col("__l").isNull(), F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.withColumn("diff_status", status)
        .where(F.col("diff_status").isNotNull())
        .select(*key_cols, "diff_status")
    )
