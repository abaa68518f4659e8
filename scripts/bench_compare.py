"""Compare two BENCH_full.json artifacts (optimization rounds).

    python scripts/bench_compare.py BEFORE.json AFTER.json [--md]

Prints per-query before/after/ratio (host-normalized by each run's own
calibration stamp so a box-speed change between the runs does not read
as a code change), sorted by absolute normalized saving, plus family
and headline/full totals.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--md"]
    md = "--md" in sys.argv[1:]
    with open(args[0]) as f:
        a = json.load(f)
    with open(args[1]) as f:
        b = json.load(f)
    ca, cb = a["calibration_sec"], b["calibration_sec"]
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(set(qa) | set(qb)):
        ta, tb = qa.get(name), qb.get(name)
        if ta is None or tb is None:
            rows.append((0.0, name, ta, tb, None))
            continue
        na, nb = ta / ca, tb / cb
        rows.append((na - nb, name, ta, tb, (nb / na if na else None)))
    rows.sort(key=lambda r: -abs(r[0]))
    sep = "|" if md else " "
    if md:
        print("| query | before (s) | after (s) | norm ratio |")
        print("|---|---|---|---|")
    for delta, name, ta, tb, ratio in rows:
        r = f"{ratio:.2f}x" if ratio is not None else "n/a"
        ta_s = f"{ta:.3f}" if ta is not None else "-"
        tb_s = f"{tb:.3f}" if tb is not None else "-"
        if md:
            print(f"| {name} | {ta_s} | {tb_s} | {r} |")
        else:
            print(f"{name:36s} {ta_s:>9} -> {tb_s:>9}  norm {r}")
    print()
    print(
        f"calibration: before {ca} after {cb} "
        f"(box {'slower' if cb > ca else 'faster'} after, x{cb/ca:.2f})"
    )
    for key in ("value", "full_total"):
        va, vb = a.get(key), b.get(key)
        if va and vb:
            print(
                f"{key}: {va} -> {vb} raw ({vb/va:.3f}x); "
                f"host-normalized {(vb/cb)/(va/ca):.3f}x"
            )
    fa, fb = a.get("families", {}), b.get("families", {})
    for fam in sorted(set(fa) | set(fb)):
        va, vb = fa.get(fam, 0.0), fb.get(fam, 0.0)
        if va and vb:
            print(
                f"  family {fam:20s} {va:8.2f} -> {vb:8.2f} raw; "
                f"norm {(vb/cb)/(va/ca):.3f}x"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
