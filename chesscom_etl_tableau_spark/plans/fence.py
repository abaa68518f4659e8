"""Size fences for data-dependent broadcast join sides.

A HAVING-survivor aggregate (TPC-H Q18's ``sum(qty) > T`` orders,
Q20's excess-stock pairs, a top-N key list with caller-chosen N) has a
row count that depends on the data, not the schema. Hinting
``F.broadcast`` on such a side bakes a size assumption into the plan:
right at sf0.1, wrong at 100x when the survivor set outgrows driver /
executor memory. These helpers make the 100x behavior deliberate
(verdict-r5 ask #4), mirroring the plan-size guard pattern of
``operators/similarity.py::with_rp_signature``:

- ``fenced_broadcast`` — for *data-dependent* sides. Under AQE (this
  engine's default, ``session.py``) it returns the frame UNHINTED: the
  aggregate materializes as a shuffle query stage and AQE picks
  broadcast vs shuffle join from the stage's *actual* size — runtime
  sizing with zero extra passes, strictly better than any static
  estimate. Only when AQE is off does it fall back to a bounded count
  probe (``limit(max_rows+1).count()``) and hint broadcast iff the
  side is provably small; the probe's extra subtree execution is the
  documented price of static planning without runtime stats.
- ``bounded_broadcast`` — for sides with a *static* row bound (a
  ``limit(n)`` top-N list): hint broadcast iff the bound itself is
  under the threshold. Zero cost, no probe needed.

Both paths compute identical results (the hint only steers the
physical join strategy); ``tests/test_round6_guards.py`` pins parity
and that the fallback engages on an oversized-survivor fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many survivor rows a broadcast stops being safe: at ~24
# bytes/row for a narrow (key, measure) pair, 4M rows is ~100 MB on the
# driver plus a copy per executor — past the point where a shuffle join
# of an already-aggregated side is cheaper and strictly safer. AQE's
# byte-based threshold (autoBroadcastJoinThreshold, 64 MB here) governs
# the runtime-sized path; this row bound governs the static paths.
SURVIVOR_BROADCAST_MAX_ROWS = 4_000_000


def fenced_broadcast(df: DataFrame, max_rows: int = SURVIVOR_BROADCAST_MAX_ROWS) -> DataFrame:
    """Broadcast a data-dependent join side only if it is actually small.

    AQE on (engine default): return ``df`` unhinted — the adaptive
    planner sizes the materialized stage at runtime and broadcasts iff
    it fits ``spark.sql.adaptive.autoBroadcastJoinThreshold``. AQE off:
    run a bounded count probe and hint only under ``max_rows``.
    """
    spark = df.sparkSession
    # No fallback arg: AQE defaults ON since Spark 3.2, and conf.get
    # with a fallback returns the FALLBACK (not the registered default)
    # when the key was never explicitly set — which would wrongly take
    # the count-probe path under any session not built by get_spark().
    if spark.conf.get("spark.sql.adaptive.enabled").lower() == "true":
        return df
    n = df.limit(max_rows + 1).count()
    return F.broadcast(df) if n <= max_rows else df


def bounded_broadcast(
    df: DataFrame, row_bound: int, max_rows: int = SURVIVOR_BROADCAST_MAX_ROWS
) -> DataFrame:
    """Broadcast a side whose row count is statically bounded by
    ``row_bound`` (e.g. a ``limit(n)`` list) — hint iff the bound is
    under the threshold, with no runtime probe."""
    return F.broadcast(df) if row_bound <= max_rows else df
