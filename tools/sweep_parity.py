#!/usr/bin/env python3
"""Resumable full-registry oracle-parity sweep at any scale factor.

Runs every registered query (gfe_db_spark.queries.all_queries) against
its DuckDB oracle on the parquet tables under --sf-dir, recording
per-entry ok/seconds into --out (JSON; existing entries are skipped, so
an interrupted sweep resumes where it left off). This is the harness the
committed PARITY_sf1.md tables come from.

Usage:
    python tools/sweep_parity.py --sf-dir /root/testdata/sf0.1 \
        --out parity_sf01.json [--names a,b,c] [--budget-s 3600]

Each record carries the time SPLIT (r7 verdict item 4), so engine walls
are attributable without re-measurement:
  - spark_s   — Spark plan build + execute + collect (the ENGINE wall);
  - oracle_s  — DuckDB oracle execute + fetch (single-process referee);
  - compare_s — normalization + value comparison (pandas, single-process);
  - sec       — end-to-end (the sum, kept for continuity with old sweeps).
Slow rows are often oracle-dominated (the oracle is deliberately
formulation-independent single-process SQL); judge the engine on spark_s.

Self-adjudicating walls (r10 verdict item 4): single-run sweep rows carry
per-entry cold cost and ±30% host noise on top of the true engine wall,
which previously forced manual isolated re-measurement of any slow row.
Two knobs close that:
  --best-of N     always run the Spark side N times, record the min (all
                  runs kept in spark_s_runs);
  --record PATH   prior sweep JSON; if this run's Spark wall exceeds
                  1.5x the recorded spark_s, the Spark side is re-run
                  once and the min is recorded — so a PARITY table
                  regenerates without a manual re-measure footnote.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--names", help="comma-separated subset; re-runs even if recorded")
    ap.add_argument("--budget-s", type=float, default=float("inf"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--driver-memory",
        default="48g",
        help="local-mode JVM heap; the sf1 pair-heavy entries OOM the 1g "
        "default (every prior committed sweep ran at 48g)",
    )
    ap.add_argument(
        "--best-of",
        type=int,
        default=1,
        help="run the Spark side N times per entry and record the min wall",
    )
    ap.add_argument(
        "--record",
        help="prior sweep JSON: re-run the Spark side once when this "
        "run's wall exceeds 1.5x the recorded spark_s for the entry",
    )
    ap.add_argument(
        "--spark-only",
        action="store_true",
        help="skip the DuckDB oracle: record rows + spark_s with ok=null "
        "('spark-only' label) — the sf10 spot-sweep mode for entries whose "
        "single-process referee, not the engine, is the bottleneck",
    )
    args = ap.parse_args()

    out = json.load(open(args.out)) if os.path.exists(args.out) else {}
    record = (
        json.load(open(args.record))
        if args.record and os.path.exists(args.record)
        else {}
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.driver.memory", args.driver_memory)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session BEFORE the first timed entry: JVM/codegen/FS-client
    # startup and the package ship otherwise land entirely on whichever
    # entry the registry rotation put first (r9: the rotated-to-front
    # dedup_lsh_pairs recorded 10.2 s in-sweep vs 1.3 s warm — an ~8 s
    # artifact that read as a regression).
    from gfe_db_spark.sources.tables import table

    spark.range(100_000).selectExpr("sum(id)").collect()
    table(spark, args.sf_dir, "documents").limit(1).collect()

    from gfe_db_spark.queries import all_queries
    from gfe_db_spark.testing import compare, duckdb_connection

    con = duckdb_connection(args.sf_dir)
    specs = all_queries()
    if args.names:
        queue = [n for n in args.names.split(",") if n in specs]
    else:
        # a full (oracle) sweep re-queues entries recorded ok=null by an
        # earlier --spark-only pass: those rows were never oracle-verified,
        # and skipping them would silently exclude them from the final
        # verdict (r7 advice)
        def _pending(n):
            if n not in out:
                return True
            return not args.spark_only and out[n].get("ok") is None

        queue = [n for n, s in specs.items() if s.sql is not None and _pending(n)]
    print(f"pending={len(queue)}", flush=True)
    t_start = time.perf_counter()
    for name in queue:
        if time.perf_counter() - t_start > args.budget_s:
            print("BUDGET reached", flush=True)
            return 3
        spec = specs[name]

        class _Collected:  # compare() calls .toPandas(); hand it the
            def __init__(self, pdf):  # already-collected frame so the
                self._pdf = pdf  # Spark wall is timed separately

            def toPandas(self):
                return self._pdf

        t0 = time.perf_counter()
        try:
            spark_walls = []
            for _ in range(max(1, args.best_of)):
                ts = time.perf_counter()
                spark_pdf = spec.fn(spark, args.sf_dir).toPandas()
                spark_walls.append(round(time.perf_counter() - ts, 1))
            prior = record.get(name, {}).get("spark_s")
            # `is not None`, not truthiness: sub-0.05s entries round to a
            # recorded 0.0, which must still adjudicate (floor the ratio
            # base at 0.1s like gen_parity_md.py does).
            if (
                prior is not None
                and len(spark_walls) == 1
                and spark_walls[0] > 1.5 * max(prior, 0.1)
            ):
                # wall exceeds the committed record: adjudicate in-sweep
                # (warm re-run) instead of leaving it to a manual footnote
                ts = time.perf_counter()
                spark_pdf = spec.fn(spark, args.sf_dir).toPandas()
                spark_walls.append(round(time.perf_counter() - ts, 1))
            spark_s = min(spark_walls)
            t1 = time.perf_counter()
            if args.spark_only:
                rec = {"ok": None, "sec": round(t1 - t0, 1),
                       "spark_s": spark_s, "rows": len(spark_pdf),
                       "detail": "spark-only (no oracle run)"}
                if len(spark_walls) > 1:
                    rec["spark_s_runs"] = spark_walls
                out[name] = rec
                print(f"{name}\tSPARK-ONLY\t{rec['sec']}s rows={rec['rows']}", flush=True)
                tmp = args.out + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(out, f, indent=1)
                os.replace(tmp, args.out)
                continue
            oracle_pdf = con.execute(spec.sql).fetchdf()
            t2 = time.perf_counter()
            r = compare(name, _Collected(spark_pdf), oracle_pdf)
            t3 = time.perf_counter()
            rec = {"ok": bool(r.ok), "sec": round(spark_s + (t3 - t1), 1),
                   "spark_s": spark_s, "oracle_s": round(t2 - t1, 1),
                   "compare_s": round(t3 - t2, 1), "rows": len(spark_pdf),
                   "detail": None if r.ok else str(r)}
            if r.ok and len(spark_pdf) == 0:
                # a 0=0 match is a VACUOUS green (the q8 lesson: 11 rounds
                # of empty-vs-empty). Keep ok=true — the engines do agree —
                # but label it so gen_parity_md / the verdict reader sees
                # which rows carry no value evidence at this scale.
                rec["vacuous"] = True
                rec["detail"] = "OK but 0=0 at this scale (no value evidence)"
            if len(spark_walls) > 1:
                rec["spark_s_runs"] = spark_walls
        except Exception as e:  # recorded, sweep continues
            rec = {"ok": False, "sec": round(time.perf_counter() - t0, 1),
                   "detail": f"ERR {type(e).__name__}: {e}"}
            traceback.print_exc(file=sys.stderr)
        out[name] = rec
        split = (
            f"\tspark={rec.get('spark_s')}s oracle={rec.get('oracle_s')}s"
            if "spark_s" in rec
            else ""
        )
        label = "OK" if rec["ok"] else "FAIL"
        if rec.get("vacuous"):
            label = "OK-VACUOUS"
        print(f"{name}\t{label}\t{rec['sec']}s{split}", flush=True)
        # atomic checkpoint: a crash mid-dump must not destroy the resume
        # file this tool exists to preserve
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)
    n_ok = sum(1 for v in out.values() if v["ok"])
    n_sparkonly = sum(1 for v in out.values() if v["ok"] is None)
    print(f"DONE {len(out)} recorded, {n_ok} ok, {n_sparkonly} spark-only", flush=True)
    # spark-only rows are labeled, not failed: exit 0 when every row is
    # either oracle-green or an explicit spark-only record
    return 0 if n_ok + n_sparkonly == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
