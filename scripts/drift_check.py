"""Calibration-normalized bench drift gate (r11 verdict ask #1).

Every round since r7 spent its first session re-adjudicating host noise:
the driver's in-context bench run reads a uniform 1.2-1.7x inflation vs
the recorded baseline (the documented r5/r7/r9/r11 signature), firing
the 2x gate on rows that come back in-band on an idle box. bench.py has
emitted a host-speed yardstick (`calibration_sec`, a fixed
data-independent 50M-row codegen workload) since r5 — this script
finally USES it: each reading is divided by host_factor =
run_calibration / recorded_calibration before the gate compares it to
its recorded row, so uniform host inflation cancels and only genuine
plan regressions flag.

Gate: flag a query when min(raw, normalized) exceeds 2x its recorded
row; rows recorded under 0.25s use an absolute 0.75s floor instead
(sub-second rows are scheduling-noise dominated). min() because the
calibration workload (pure CPU) can inflate MORE than an I/O-bound
query under load — normalization may then over-correct, and a gate on
the normalized value alone would mask a genuine plan regression. Host
inflation can only EXCUSE a reading, never amplify the excuse. Eager
pipeline entries carry the documented 1.4-1.9x single-run variance
band — they flag only above 2.0x like everything else, but the report
marks them.

Usage:
    python scripts/drift_check.py [BENCH_full.json] [--baseline BASELINE.md]

Exit 0 = no flags; exit 1 = at least one normalized flag (the list is
printed with raw, normalized, and recorded values so an adjudication
note can quote it directly).
"""

from __future__ import annotations

import json
import re
import sys

SECTION = "## Recorded full-registry baseline"


def parse_baseline(path: str) -> tuple[dict[str, float], float]:
    """Recorded per-query rows + the recorded calibration reading from
    the section header prose ('calibration 0.085s')."""
    text = open(path).read()
    m = re.search(re.escape(SECTION) + r".*?(?=\n## |\Z)", text, re.S)
    if not m:
        sys.exit(f"no '{SECTION}' section in {path}")
    block = m.group(0)
    cm = re.search(r"calibration ([0-9.]+)s", block)
    if not cm:
        sys.exit("recorded baseline section carries no calibration reading")
    cal = float(cm.group(1))
    rows: dict[str, float] = {}
    for line in block.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 4 and not cells[0].startswith("-") and cells[0] != "Query":
            for name, sec in ((cells[0], cells[1]), (cells[2], cells[3])):
                if name and sec:
                    try:
                        rows[name] = float(sec)
                    except ValueError:
                        pass
    return rows, cal


def main() -> None:
    args = [a for a in sys.argv[1:]]
    baseline_path = "BASELINE.md"
    if "--baseline" in args:
        i = args.index("--baseline")
        baseline_path = args[i + 1]
        del args[i : i + 2]
    bench_path = args[0] if args else "BENCH_full.json"

    text = open(bench_path).read().strip()
    try:
        bench = json.loads(text)  # BENCH_full.json (indented) or one-line
    except json.JSONDecodeError:
        bench = json.loads(text.splitlines()[-1])  # captured stdout tail
    recorded, rec_cal = parse_baseline(baseline_path)
    run_cal = bench.get("calibration_sec")
    if not run_cal:
        sys.exit(f"{bench_path} carries no calibration_sec — cannot normalize")
    host_factor = run_cal / rec_cal
    eager = set(bench.get("eager_queries", []))

    flags, unmatched = [], []
    tot_raw = tot_rec = 0.0
    for name, raw in sorted(bench["queries"].items()):
        rec = recorded.get(name)
        if rec is None:
            unmatched.append(name)
            continue
        norm = raw / host_factor
        tot_raw += raw
        tot_rec += rec
        threshold = 2.0 * rec
        if rec < 0.25:
            threshold = max(threshold, 0.75)
        if min(raw, norm) > threshold:
            flags.append((name, raw, norm, rec, name in eager))

    print(
        f"calibration: run {run_cal}s vs recorded {rec_cal}s "
        f"-> host_factor {host_factor:.3f}"
    )
    print(
        f"aggregate: raw {tot_raw:.1f}s vs recorded {tot_rec:.1f}s "
        f"({tot_raw / tot_rec:.2f}x raw, "
        f"{tot_raw / host_factor / tot_rec:.2f}x normalized) "
        f"over {len(bench['queries']) - len(unmatched)} matched queries"
    )
    if unmatched:
        print(f"unmatched (no recorded row — record before sealing): {unmatched}")
    if flags:
        print(f"\n{len(flags)} NORMALIZED flag(s) over the gate:")
        for name, raw, norm, rec, is_eager in flags:
            tag = " [eager single-run band]" if is_eager else ""
            print(
                f"  {name}: raw {raw:.3f}s, normalized {norm:.3f}s "
                f"vs recorded {rec:.3f}s ({norm / rec:.2f}x){tag}"
            )
        sys.exit(1)
    print("no flags: every normalized reading within the gate")


if __name__ == "__main__":
    main()
