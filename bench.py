#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the widest/most shuffle-heavy plans in the inventory, one
# per operator family (relational, joins incl. range/as-of, windows,
# dedup/LSH, ANN, text, multimodal, streaming-batch, graph, GFE domain).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "j1_broadcast_lookup",
    "j7_anti_join",
    "asof_last_purchase",
    "range_band_join",
    "w2_topk_per_group",
    "a6_array_set_union",
    "a8_explode_distinct_count",
    "f6_conditional_pivot",
    "a13_monotonicity_guard",
    "dedup_lsh_pairs",
    "dedup_embedding_cosine",
    "knn_brute_force",
    "ann_topk_join",
    "text_token_stats",
    "text_tfidf_top_terms",
    "multimodal_metadata",
    "sessionize",
    "graph_3hop_motif",
    "gfe_end_to_end",
    # round-3 training-pipeline additions
    "pack_sequences",
    "benchmark_contamination",
    "text_repetition_stats",
    "timeseries_gapfill_locf",
    # late-r3: tokenizer training, PQ ANN, layout, incremental dedup
    "bpe_vocab_stats",
    "knn_pq_adc",
    "zorder_layout",
    "dedup_incremental",
    # sliding-window exact distinct (dedupe -> bounded explode -> keyed agg)
    "rolling_distinct_users_7d",
    # round-4: pigeonhole-banded SimHash pairs, global prefix-sum
    # sharding, and iterative GD training (3 full-corpus agg passes)
    "dedup_simhash_hamming",
    "shard_by_token_budget",
    "logreg_quality_train",
]


def main() -> None:
    from gfe_db_spark.queries import all_queries
    from gfe_db_spark.session import get_spark

    spark = get_spark("gfe_db_spark_bench")
    specs = all_queries()

    # Warm-up: run every bench query once at the smallest SF so JVM JIT +
    # whole-stage codegen compilation happen outside the timed section
    # (standard benchmarking practice; results unchanged).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            if name in specs:
                try:
                    specs[name].fn(spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:
                    pass

    # Warm-up leaves cached RDDs behind (build_release caches its fan-out
    # inputs); drop them so no query is timed under another's memory.
    spark.catalog.clearCache()

    # Warm the TIMED scale factor too (the sweep tool's r9 fix, commit
    # 0e4b6bf, applied here): the sf0.001 pass above compiles the plans,
    # but the SF_DIR parquet footers / FS client / shuffle service are
    # first touched by whichever query runs first, so q1 carried
    # first-in-suite warmup in two consecutive driver rounds. One small
    # shuffle plus a one-row read per table moves that cost outside the
    # timed section; results unchanged.
    from gfe_db_spark.sources.tables import TABLES, table

    spark.range(100_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        try:
            table(spark, SF_DIR, t).limit(1).collect()
        except Exception:
            pass
    spark.catalog.clearCache()

    # Host-noise calibration anchor (r10 verdict item 1): time a fixed
    # CPU-bound job so any reader can normalize this run's walls against
    # other rounds/hosts without hand A/Bs. Two components: a
    # codegen-only range sum (pure CPU, no shuffle) and a fixed
    # 32-partition hash aggregation (the shuffle path the suite leans
    # on). The calib plan shape is warmed once untimed, then timed
    # best-of-2. Measured quiet-host value on the 32-vCPU builder VM in
    # a full bench run (r11): calib_s ~= 0.8 (range_sum ~0.3s +
    # hash_agg ~0.5s warm); readings over ~1.3 indicate a host-slow
    # phase (the same code/data swung 43-55s suite walls within one
    # day, AB_BENCH_r10.md) — scale cross-round comparisons by the
    # calib ratio before reading any per-query delta as a regression.
    #
    # Runs AFTER the timed query loop (r11 advice): in r11 it ran
    # before, which warmed the JVM ~2.4s beyond what r10-and-earlier
    # suites saw and skewed cross-round suite-total comparisons. Host
    # phases last hours, so an after-suite anchor measures the same
    # phase; r11's calib_s (pre-suite) remains comparable within ~5%.
    def _calib_job():
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 100000 AS k")
            .groupBy("k")
            .agg({"k": "count"})
            .selectExpr("sum(`count(k)`)")
            .collect()
        )

    def _run_calib() -> float:
        _calib_job()  # untimed: compile the calib plan shape itself
        calib = None
        for _ in range(2):
            t0 = time.perf_counter()
            _calib_job()
            dt = time.perf_counter() - t0
            calib = dt if calib is None else min(calib, dt)
        return calib

    # Python-side calibration anchor (r12 verdict item 3): the JVM calib
    # above cannot see Python/Arrow-side host phases (the build bench
    # spends its wall in mapInPandas EMBL parsing — a different resource
    # profile than codegen'd SQL), which left ~11% same-JVM-calib
    # residual variance unattributable (AB_BENCH_r12.md). This anchor
    # times a fixed in-process parse of 500 synthetic EMBL records —
    # pure single-thread Python, no Spark — so a build-throughput move
    # can be split into host-phase (calib_py_s moved too) vs real.
    def _calib_py() -> float:
        from gfe_db_spark.sources.imgt import parse_embl_record
        from gfe_db_spark.testing_fixtures import synthetic_allele_records

        recs = synthetic_allele_records(2000)

        def job():
            for rec in recs:
                parse_embl_record(rec)

        job()  # untimed warm pass (interns/caches, code objects hot)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            job()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        if name not in specs:
            continue
        fn = specs[name].fn
        best = None
        for _ in range(runs):
            # Clear BEFORE every timed run, not just between queries (r13
            # measurement fix): some operators persist() a compact
            # intermediate so plan branches share one materialization
            # WITHIN a run; without this clear, run 2 of best-of-N would
            # read run 1's cache instead of computing from parquet. Every
            # timed run now provably starts cache-cold.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # Force full execution without driver-side materialization cost.
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        total += best
        spark.catalog.clearCache()

    calib = _run_calib()
    calib_py = _calib_py()

    extras = _bench_gfe_build(spark)
    extras.update(_bench_incremental_load(spark))

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "calib_s": round(calib, 4),
        "calib_py_s": round(calib_py, 4),
        **extras,
    }
    print(json.dumps(result))

    # Auto-refresh the committed trend file so it can't go stale a round
    # (r12 verdict item 2). Only for a full run at the default scale AND
    # the default core count — sf0.001 probes, subset runs and the
    # driver's reduced-core scaling runs aren't trend-comparable (an
    # 8-core full run overwrote the head row with incomparable walls in
    # the r13 session-2 audit).
    from gfe_db_spark.session import DEFAULT_CPUS

    if (
        SF_DIR == "/root/testdata/sf0.1"
        and len(timings) == len(BENCH_QUERIES)
        and os.environ.get("SPARK_GRAFT_CPUS", DEFAULT_CPUS) == DEFAULT_CPUS
    ):
        try:
            sys.path.insert(0, os.path.join(_REPO, "tools"))
            from gen_bench_trend import write_trend

            write_trend(_REPO, result)
        except Exception:
            pass  # the trend file is evidence, never a bench failure


def _bench_gfe_build(spark) -> dict:
    """Domain-side throughput: parse → build → graph-load N synthetic
    alleles (17 features each, the HLA-A shape) and report alleles/s.
    BASELINE.md's reference figure is ~20-40 alleles/s (35k alleles in
    15-30 min on 8 vCPU, including its per-allele REST annotation)."""
    import shutil
    import tempfile

    n = int(os.environ.get("SPARK_GRAFT_BENCH_ALLELES", "2000"))
    if n <= 0:
        return {}
    from gfe_db_spark.plans.accession import AccessionRegistry
    from gfe_db_spark.plans.build import build_release
    from gfe_db_spark.plans.load import load_release
    from gfe_db_spark.sources.imgt import read_imgt_dat
    from gfe_db_spark.testing_fixtures import write_synthetic_dat

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    best = None
    try:
        for _ in range(runs):  # best-of-N: each run on a fresh registry
            tmp = tempfile.mkdtemp(prefix="gfe_bench_")
            try:
                dat = write_synthetic_dat(tmp, "3560", n)
                t0 = time.perf_counter()
                alleles = read_imgt_dat(spark, dat)
                built = build_release(
                    spark, alleles, "3560", AccessionRegistry(spark, f"{tmp}/registry")
                )
                graph = load_release(spark, built, "3560")
                # Force every output table end-to-end. The 16 tables are
                # independent jobs — submit them from a small thread pool
                # so the next job's tasks back-fill executors freed by the
                # previous job's straggler tail (guide §2.6) instead of
                # serializing 16 job latencies. Same computation, same
                # tables forced; the registry commit already happened
                # eagerly inside build_release, so nothing here races a
                # write (concurrent cache fills are CacheManager-safe).
                from concurrent.futures import ThreadPoolExecutor

                tables = [built.gfe_sequences, built.all_features,
                          built.all_groups, built.all_cds, built.errors]
                tables += [df for _, df in graph.items()]

                def _force(df):
                    df.write.format("noop").mode("overwrite").save()

                with ThreadPoolExecutor(max_workers=3) as pool:
                    list(pool.map(_force, tables))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            finally:
                spark.catalog.clearCache()
                shutil.rmtree(tmp, ignore_errors=True)
        phases = _build_phase_walls(spark, n)
        return {
            "build_alleles_per_s": round(n / best, 1),
            "build_n_alleles": n,
            "build_wall_s": round(best, 2),
            **phases,
        }
    except Exception:
        return {}


def _build_phase_walls(spark, n: int) -> dict:
    """One extra INSTRUMENTED build run with a materialization barrier
    after each phase, so a build-throughput move is attributable to a
    phase from a single bench run (r12 verdict item 3 — the ~11%
    same-calib residual variance needed an A/B session to localize).
    Phases: parse (mapInPandas EMBL → cached alleles), build (feature
    fan-out + GFE naming + accession-registry commit), load (graph MERGE
    layout). The phase sum exceeds build_wall_s slightly — the barriers
    add a cache materialization the headline pipelined run doesn't pay —
    so compare phases ACROSS rounds, not against build_wall_s."""
    import shutil
    import tempfile

    from gfe_db_spark.plans.accession import AccessionRegistry
    from gfe_db_spark.plans.build import build_release
    from gfe_db_spark.plans.load import load_release
    from gfe_db_spark.sources.imgt import read_imgt_dat
    from gfe_db_spark.testing_fixtures import write_synthetic_dat

    tmp = tempfile.mkdtemp(prefix="gfe_bench_phase_")
    try:
        dat = write_synthetic_dat(tmp, "3560", n)
        t0 = time.perf_counter()
        alleles = read_imgt_dat(spark, dat).cache()
        alleles.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        built = build_release(
            spark, alleles, "3560", AccessionRegistry(spark, f"{tmp}/registry")
        )
        for df in (built.gfe_sequences, built.all_features, built.all_groups,
                   built.all_cds, built.errors):
            df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        graph = load_release(spark, built, "3560")
        for _, df in graph.items():
            df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        return {
            "build_phase_walls": {
                "parse_s": round(t1 - t0, 2),
                "build_s": round(t2 - t1, 2),
                "load_s": round(t3 - t2, 2),
            }
        }
    except Exception:
        return {}
    finally:
        spark.catalog.clearCache()
        shutil.rmtree(tmp, ignore_errors=True)


def _bench_incremental_load(spark) -> dict:
    """End-to-end incremental ingestion: detect → build → partitioned
    graph MERGE commit → watermark, for two consecutive releases.
    BASELINE.md's reference figure is ≥1 h per release-load; this reports
    seconds per release for the same logical work (graph upsert included)."""
    import shutil
    import tempfile

    n = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_ALLELES", "500"))
    if n <= 0:
        return {}
    from gfe_db_spark.streaming.incremental import run_incremental
    from gfe_db_spark.testing_fixtures import write_synthetic_dat

    tmp = tempfile.mkdtemp(prefix="gfe_bench_incr_")
    try:
        for rel in ("3550", "3560"):
            write_synthetic_dat(tmp, rel, n)
        t0 = time.perf_counter()
        res = run_incremental(
            spark,
            tmp,
            ["3550", "3560"],
            state_path=f"{tmp}/state.json",
            registry_path=f"{tmp}/registry",
            graph_path=f"{tmp}/graph",
        )
        dt = time.perf_counter() - t0
        if res.processed != ["3550", "3560"]:
            return {}
        return {
            "incremental_releases": 2,
            "incremental_alleles_per_release": n,
            "incremental_s_per_release": round(dt / 2, 2),
        }
    except Exception:
        return {}
    finally:
        spark.catalog.clearCache()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
