#!/usr/bin/env python3
"""Render PARITY_sf1.md's per-entry table from two sweep JSONs.

Usage:
    python tools/gen_parity_md.py --sf1 .testdata/PARITY_sf1_r11_raw.json \
        --sf01 .testdata/PARITY_sf01_r11_raw.json [--flag-threshold-s 5]

Prints the markdown table (entry | ok | sf1 s | spark s | oracle s |
sf0.1 s | growth | spark-growth) plus the totals line and the
>2x-scan-ratio flag list to stdout; the caller pastes it under the
hand-written preamble. Growth = sf1 sec / sf0.1 sec end-to-end;
spark-growth = engine wall only. With the r11 self-adjudicating sweep
(`--record`/`--best-of`), walls are already best-of where a re-run
fired (`spark_s_runs` present), so no manual footnotes are needed.
"""
from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", required=True)
    ap.add_argument("--sf01", required=True)
    ap.add_argument("--flag-threshold-s", type=float, default=5.0)
    ap.add_argument("--scan-ratio", type=float, default=10.0)
    args = ap.parse_args()
    sf1 = json.load(open(args.sf1))
    sf01 = json.load(open(args.sf01))

    rows = []
    flags = []
    for name in sorted(sf1):
        a, b = sf1[name], sf01.get(name, {})
        ok = "OK" if a.get("ok") else ("spark-only" if a.get("ok") is None else "FAIL")
        s1, sp1, o1 = a.get("sec"), a.get("spark_s"), a.get("oracle_s")
        s0, sp0 = b.get("sec"), b.get("spark_s")
        growth = round(s1 / s0, 1) if s1 and s0 else None
        sgrowth = round(sp1 / sp0, 1) if sp1 and sp0 else None
        adj = "*" if "spark_s_runs" in a else ""
        rows.append(
            f"| {name} | {ok} | {s1} | {sp1}{adj} | {o1} | {s0} | "
            f"{growth if growth is not None else '—'} | "
            f"{sgrowth if sgrowth is not None else '—'} |"
        )
        if (
            sp1
            and sp0
            and sp1 >= args.flag_threshold_s
            and sp1 / max(sp0, 0.1) > 2 * args.scan_ratio
        ):
            flags.append((name, sp0, sp1))

    tot1 = sum(v.get("sec") or 0 for v in sf1.values())
    totsp1 = sum(v.get("spark_s") or 0 for v in sf1.values())
    tot0 = sum(v.get("sec") or 0 for v in sf01.values())
    n_ok = sum(1 for v in sf1.values() if v.get("ok"))
    n_adj = sum(1 for v in sf1.values() if "spark_s_runs" in v)
    print(f"<!-- {n_ok}/{len(sf1)} OK; {n_adj} walls self-adjudicated (marked *) -->")
    print(
        f"<!-- totals: sf1 engine {totsp1:.0f}s, sf1 end-to-end {tot1:.0f}s, "
        f"sf0.1 end-to-end {tot0:.0f}s -->"
    )
    if flags:
        print("<!-- spark-side >2x scan-ratio flags: -->")
        for f in flags:
            print(f"<!--   {f[0]}: {f[1]}s -> {f[2]}s -->")
    else:
        print("<!-- spark-side >2x scan-ratio flags: none -->")
    print()
    print("| entry | ok | sf1 s | spark s | oracle s | sf0.1 s | growth | spark-growth |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
