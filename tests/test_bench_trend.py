"""BENCH_TREND.md freshness, pinned as code (r12 verdict missing item 2:
the trend file silently lacked the r12 row for a round).

The committed trend table must contain one row per committed
BENCH_r*.json with that file's exact suite total — so when the driver
lands a new bench artifact at round start, this test fails until the
trend is regenerated (bench.py also auto-refreshes it after every full
default-scale run)."""

from __future__ import annotations

import glob
import importlib.util
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "gen_bench_trend", os.path.join(_REPO, "tools", "gen_bench_trend.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_trend_covers_every_committed_bench_artifact():
    mod = _load_tool()
    text = open(os.path.join(_REPO, "BENCH_TREND.md")).read()
    rows = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^\| (r\d+|head) \| ([\d.]+) \|", text, re.M)
    }
    missing, stale = [], []
    for path in sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json"))):
        # canonical round artifacts only — variant artifacts at other
        # core counts (BENCH_r13_c8.json) are not trend rows
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if m is None:
            continue
        rnd = f"r{int(m.group(1))}"
        d = mod.load_bench(path)
        if d is None:
            continue
        if rnd not in rows:
            missing.append(rnd)
        elif abs(rows[rnd] - d["value"]) > 1e-6:
            stale.append((rnd, rows[rnd], d["value"]))
    assert not missing and not stale, (
        f"BENCH_TREND.md out of date — missing rounds: {missing}, "
        f"stale totals: {stale}. Regenerate: "
        "python tools/gen_bench_trend.py > BENCH_TREND.md"
    )
