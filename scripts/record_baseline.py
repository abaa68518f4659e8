"""Append/refresh the full-registry recorded baseline table in BASELINE.md.

Reads a bench.py JSON line (full mode) and rewrites the section
``## Recorded full-registry baseline`` with one row per query, so every
future BENCH_r{N}.json is auditable line-by-line against a recorded
number instead of only the ~40 headline rows. Usage:

    python bench.py 2>/dev/null > /tmp/bench.json
    python scripts/record_baseline.py /tmp/bench.json
"""

from __future__ import annotations

import json
import re
import sys

SECTION = "## Recorded full-registry baseline"


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(f"usage: {sys.argv[0]} <bench-json-file>")
    bench = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    qs: dict[str, float] = bench["queries"]
    lines = [
        SECTION + " (sf0.1, local[32], warm)",
        "",
        f"`python bench.py` full mode — {len(qs)} queries, "
        f"headline subtotal {bench['value']}s, full total "
        f"{bench.get('full_total', '?')}s, calibration "
        f"{bench.get('calibration_sec', '?')}s. Eager pipeline entries "
        "(temp-dir write/commit roundtrips) are median-of-3 cold runs "
        "(single-run before r14); lazy queries median-of-3 warm; "
        "headline median-of-5. Box noise is ±30% "
        "(see the noise-attribution note) — treat >2x a recorded row, "
        "sustained across rounds, as a regression signal, not one bad run.",
        "",
        "| Query | sec | Query | sec |",
        "|---|---|---|---|",
    ]
    names = sorted(qs)
    half = (len(names) + 1) // 2
    for i in range(half):
        left = f"{names[i]} | {qs[names[i]]}"
        j = half + i
        right = f"{names[j]} | {qs[names[j]]}" if j < len(names) else " | "
        lines.append(f"| {left} | {right} |")
    block = "\n".join(lines) + "\n"

    text = open("BASELINE.md").read()
    pat = re.compile(re.escape(SECTION) + r".*?(?=\n## |\Z)", re.S)
    if pat.search(text):
        text = pat.sub(block.rstrip("\n") + "\n", text)
    else:
        text = text.rstrip("\n") + "\n\n" + block
    open("BASELINE.md", "w").write(text)
    print(f"recorded {len(qs)} rows into BASELINE.md")


if __name__ == "__main__":
    main()
