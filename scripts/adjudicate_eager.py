"""Fresh-session median-of-N adjudication for flagged eager bench rows.

Each timing runs in a brand-new Python/JVM process (the documented
adjudication protocol: a shared session that ran other heavy queries
first inflates eager rows — BASELINE.md ann_ivfpq_topk note). Usage:

    python scripts/adjudicate_eager.py ann_ivfpq_refit ann_ivf_compact ...

Prints one JSON line per query: {"query": ..., "runs": [...], "median": ...}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entry_mod
from chesscom_etl_tableau_spark.session import get_spark
spark = get_spark("adjudicate")
qs = entry_mod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
t0 = time.time()
qs[{name!r}](spark, sf_dir).count()
print("ADJ_SEC=%.3f" % (time.time() - t0))
"""


def one_run(name: str) -> float:
    code = CHILD.format(repo=REPO, name=name)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("ADJ_SEC="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"{name}: no timing in output\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = 3
    for name in names:
        runs = [one_run(name) for _ in range(n)]
        med = sorted(runs)[n // 2]
        print(json.dumps({"query": name, "runs": runs, "median": med}), flush=True)


if __name__ == "__main__":
    main()
