"""Continuous data-quality monitoring over a stream.

Runs the batch DQ contract (`operators/quality_checks.py::dq_report`)
per microbatch via ``foreachBatch`` and appends the rule rows —
stamped with the batch id — to a parquet report sink. The batch gate's
"one fused scan for all row-level rules" property carries over
unchanged: each microbatch is scanned once no matter how many rules.

This is monitoring, not admission control: violations are recorded,
not dropped (the reference's status-log philosophy —
`fetch_and_post.py`'s best-effort audit trail — applied to data
contracts). An admission variant would filter the batch on the same
predicates before its downstream write; the report tells you when to
turn that on.

Exactly-once-ish: foreachBatch may re-run a batch on recovery; report
rows carry batch_id, so readers dedup with first-seen-wins per
(batch_id, rule) — the same convention as the status log sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dq_gate(
    stream: DataFrame,
    report_path: str,
    checkpoint_path: str,
    rules: dict,
):
    """Attach a DQ report writer to `stream`. `rules` are the keyword
    arguments of `dq_report` (unique_keys, accepted_values, ...).
    Returns the started StreamingQuery (availableNow trigger — the
    scheduled-drain idiom used across this repo's streaming surface).
    """
    from chesscom_etl_tableau_spark.operators.quality_checks import dq_report

    def audit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            dq_report(batch_df, **rules)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(report_path)
        )

    return (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
