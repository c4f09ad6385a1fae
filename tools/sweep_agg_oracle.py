#!/usr/bin/env python3
"""Aggregate-form oracle sweep for pair-heavy entries (r9 verdict item 3).

The full-row referee (tools/sweep_parity.py) fetches both engines' result
sets into pandas and compares values — infeasible for the sf10 entries
whose DECLARED output is tens of millions of pair rows (the referee is a
single process). This sweep instead reduces BOTH engines' results to 16
tiny aggregate rows and compares those:

    shard    = md5_le32(rowstr) % 16
    n_rows   = COUNT(*)
    checksum = bit_xor(md5_le32(rowstr || ':agg'))   -- order-insensitive
    hashsum  = SUM(md5_le32(rowstr || ':agg'))        -- duplicate-sensitive

where ``rowstr`` is the '|'-joined canonical rendering of every output
column, columns sorted by name (the same convention testing.compare uses
before hashing). Doubles are rendered as round(x*1e9) cast to BIGINT —
every registered double in these entries is already round(_, 9), so the
scaled value is an exact integer in both engines; NULLs render '<NULL>'.
md5_le32 is the repo's engine-portable hash contract
(operators/text.hash_le32_expr == DuckDB md5_number_upper & 0xFFFFFFFF),
pinned by its own unit test. XOR alone would cancel even-multiplicity
duplicate rows; the hashsum + per-shard counts close that hole.

Equality of the 16 (shard, n_rows, checksum, hashsum) rows holds iff the
result MULTISETS agree up to md5 collision — this upgrades the sf10
"spark-only" rows (engine-wall-only evidence) to value-checked without
ever materializing the pair set in the referee.

Usage:
    python tools/sweep_agg_oracle.py --sf-dir .testdata/sf10 \
        --out .testdata/PARITY_sf10_agg_r10.json --names dedup_lsh_pairs,...
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: rendering templates per Spark dtype — (spark_expr_fmt, duckdb_expr_fmt)
_NULL = "<NULL>"


#: referee-feasibility oracle overrides. The REGISTERED oracle stays the
#: formulation-independent one (and is what every full-row parity run
#: checks at sf0.001/0.01/0.1/1); an override here is an algebraically
#: equivalent reformulation used ONLY when the registered formulation is
#: infeasible for the single-process referee at sf10. dedup_ngram_jaccard:
#: the ungated shingle self-join explodes k²-per-bucket under the sf10
#: corpus's 100-way duplication (the same mechanism that ENOSPC'd the r7
#: Spark-side probe and OOM-killed the r10 referee) — this override
#: applies the exact-digest gate IN SQL: shingle-join over distinct texts
#: only, doc-level pairs expanded back through the md5(text) classes.
#: Row-identity of gated vs ungated is pinned independently by
#: tests/test_operators.py::test_ngram_jaccard_gated_equals_ungated and
#: the hypothesis random-corpus test, plus full-row parity against the
#: UNGATED SQL at every smaller SF.
AGG_SQL_OVERRIDES = {
    "dedup_ngram_jaccard": r"""
WITH t AS (
  SELECT doc_id, text,
         (text IS NOT NULL
          AND len(string_split_regex(text, '\s+')) >= 3) AS elig
  FROM documents
), cls AS (
  SELECT doc_id,
         CASE WHEN elig THEN MIN(doc_id) OVER (PARTITION BY md5(text))
              ELSE doc_id END AS rep_id,
         text
  FROM t
), reps AS (
  SELECT doc_id, text FROM cls WHERE doc_id = rep_id
), rt AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM reps
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM rt
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS ra, b.doc_id AS rb, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), rep_pairs AS (
  SELECT ra, rb, n_common,
         round(n_common / (sa.sz + sb.sz - n_common), 9) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = ra
  JOIN sizes sb ON sb.doc_id = rb
  WHERE round(n_common / (sa.sz + sb.sz - n_common), 9) >= 0.5
), cross_pairs AS (
  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         greatest(ma.doc_id, mb.doc_id) AS doc_b,
         p.n_common, p.jaccard
  FROM rep_pairs p
  JOIN cls ma ON ma.rep_id = p.ra
  JOIN cls mb ON mb.rep_id = p.rb
), within AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         sz.sz AS n_common, 1.0 AS jaccard
  FROM cls x
  JOIN cls y ON x.rep_id = y.rep_id AND x.doc_id < y.doc_id
  JOIN sizes sz ON sz.doc_id = x.rep_id
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common, jaccard
FROM (SELECT * FROM cross_pairs UNION ALL SELECT * FROM within)
""",
}


#: entries whose registered oracle closes near-dup pairs into connected
#: components with a recursive CTE (`reach(node, lab)`). The recursion is
#: the single-process referee's straggler at large-slice scale: DuckDB
#: materializes up to |component|^2 (node, label) rows per component
#: (25+ min on 645-way-class edge sets, r11). The union-find referee
#: below replaces ONLY that closure with a linear single-process
#: union-find over the SAME oracle's own `pairs` CTE output — every other
#: CTE of the registered oracle (gates, shingles, Jaccard threshold,
#: Bloom, split hash, final aggregation) runs unchanged in DuckDB, so the
#: value check stays anchored to the registered formulation.
#: (corpus_prep_pipeline_v3 is the one CC-era spark-only entry NOT here:
#: its oracle has no recursive CTE — it runs through the normal path.)
CC_UNION_FIND_ENTRIES = {
    "dedup_clusters",
    "dedup_keep_list",
    "leakage_safe_split",
    "corpus_prep_pipeline",
    "corpus_prep_pipeline_v2",
}

#: the exact transitive-closure CTE shared by every CC-family oracle
#: (queries/dedup.py _GATED_COMPONENT_CTE and the corpus_prep oracles);
#: group(1) = the node-universe CTE the closure seeds from.
_REACH_CTE_RE = re.compile(
    r",\s*reach\(node, lab\) AS \(\s*"
    r"SELECT doc_id, doc_id FROM (\w+)\s*"
    r"UNION\s*"
    r"SELECT e\.d, r\.lab FROM reach r JOIN edges e ON e\.s = r\.node\s*\)",
)

#: the min-label aggregation over the closure that the rewrite redirects
#: at the union-find table (optionally aliased: `node AS rep_id` etc.)
_REACH_AGG_RE = re.compile(
    r"SELECT node( AS \w+)?, MIN\(lab\) AS (\w+) FROM reach GROUP BY node"
)

#: (connection id, prefix, node source) → (connection, nodes, pairs); the
#: connection is held strongly so its id cannot be recycled while cached —
#: see rewrite_cc_oracle_with_union_find.
_UF_PREFIX_CACHE: dict = {}


def rewrite_cc_oracle_with_union_find(con, sql: str) -> str:
    """Run the CC-family oracle's own prefix CTEs (through `pairs`) in
    DuckDB, compute components with a linear union-find in Python, register
    them as ``uf_comp(node, lab)`` (lab = min doc_id in the component —
    the same labeling the recursive closure's MIN(lab) produces), and
    return the oracle SQL with the recursive closure replaced by a read of
    that table. Raises if the SQL doesn't contain the exact closure shape
    (a drifted oracle must fail loudly, never half-rewrite silently)."""
    m = _REACH_CTE_RE.search(sql)
    if m is None:
        raise ValueError("oracle has no reach(node, lab) closure to replace")
    node_src = m.group(1)
    prefix = sql[: m.start()]  # all CTEs through `edges`, closed
    rest = sql[m.end() :]  # begins at the CTE after `reach`
    # The pairs CTE is the oracle's expensive part (the gated shingle
    # self-join — ~10 min on the 54k-doc mixed slice) and three of the
    # five CC entries share the identical prefix: memoize per
    # (connection, prefix). DuckDB prunes the now-unreferenced
    # pairs/edges CTEs from the rewritten query, so this is the ONLY
    # evaluation of that join per prefix. The cache entry holds a strong
    # reference to the connection itself (r12 advice): keyed on id(con)
    # alone, a GC'd connection's id could be reused by a NEW connection
    # over a different dataset whose prefix SQL is textually identical
    # (prefix SQL names tables, not paths) and silently serve the first
    # dataset's nodes/pairs. Pinning the connection makes its id stable
    # for the cache's lifetime.
    key = (id(con), prefix, node_src)
    if key not in _UF_PREFIX_CACHE:
        nodes = [
            r[0]
            for r in con.execute(f"{prefix} SELECT doc_id FROM {node_src}").fetchall()
        ]
        pairs = con.execute(f"{prefix} SELECT doc_a, doc_b FROM pairs").fetchall()
        _UF_PREFIX_CACHE[key] = (con, nodes, pairs)
    _, nodes, pairs = _UF_PREFIX_CACHE[key]

    parent = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)

    import pyarrow as pa

    con.register(
        "uf_comp",
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "lab": pa.array([comp_min[find(n)] for n in nodes], pa.int64()),
            }
        ),
    )
    rewritten, n_subs = _REACH_AGG_RE.subn(
        lambda mm: f"SELECT node{mm.group(1) or ''}, lab AS {mm.group(2)} FROM uf_comp",
        rest,
    )
    if n_subs != 1:
        raise ValueError(f"expected exactly one MIN(lab) closure read, got {n_subs}")
    return prefix + rewritten


def _spark_render(name: str, dtype: str) -> str:
    if dtype == "double" or dtype == "float":
        base = f"CAST(CAST(round(`{name}` * 1e9) AS BIGINT) AS STRING)"
    elif dtype == "boolean":
        base = f"CASE WHEN `{name}` THEN '1' ELSE '0' END"
    elif dtype in ("date", "timestamp"):
        base = f"date_format(`{name}`, 'yyyy-MM-dd HH:mm:ss')"
    else:  # integral / string / decimal-free entries
        base = f"CAST(`{name}` AS STRING)"
    return f"coalesce({base}, '{_NULL}')"


def _duck_render(name: str, dtype: str) -> str:
    if dtype == "double" or dtype == "float":
        base = f'CAST(CAST(round("{name}" * 1e9) AS BIGINT) AS VARCHAR)'
    elif dtype == "boolean":
        base = f"CASE WHEN \"{name}\" THEN '1' ELSE '0' END"
    elif dtype in ("date", "timestamp"):
        base = f"strftime(\"{name}\", '%Y-%m-%d %H:%M:%S')"
    else:
        base = f'CAST("{name}" AS VARCHAR)'
    return f"coalesce({base}, '{_NULL}')"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--names", required=True, help="comma-separated entries")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--driver-memory", default="48g")
    ap.add_argument(
        "--best-of",
        type=int,
        default=1,
        help="run the Spark side N times per entry, record the min wall",
    )
    ap.add_argument(
        "--record",
        help="prior sweep JSON: re-run the Spark side once when this "
        "run's wall exceeds 1.5x the recorded spark_s (self-adjudicating "
        "walls, r10 verdict item 4)",
    )
    args = ap.parse_args()

    out = json.load(open(args.out)) if os.path.exists(args.out) else {}
    record = (
        json.load(open(args.record))
        if args.record and os.path.exists(args.record)
        else {}
    )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.driver.memory", args.driver_memory)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from gfe_db_spark.operators.text import hash_le32_expr
    from gfe_db_spark.queries import all_queries
    from gfe_db_spark.sources.tables import table
    from gfe_db_spark.testing import duckdb_connection

    # warm the session before the first timed entry (r9 sweep fix)
    spark.range(100_000).selectExpr("sum(id)").collect()
    table(spark, args.sf_dir, "documents").limit(1).collect()

    con = duckdb_connection(args.sf_dir)
    # spill to disk instead of dying to the OOM killer: the first r10 run
    # was SIGKILLed during the ungated ngram-jaccard oracle
    con.execute("PRAGMA memory_limit='32GB'")
    con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    specs = all_queries()
    for name in args.names.split(","):
        if name not in specs:
            print(f"{name}\tSKIP unknown", flush=True)
            continue
        spec = specs[name]
        if spec.sql is None:
            print(f"{name}\tSKIP no oracle", flush=True)
            continue
        try:
            t0 = time.perf_counter()

            def _spark_side():
                df = spec.fn(spark, args.sf_dir)
                cols = sorted(df.columns)
                dtypes = dict(df.dtypes)
                rowstr = F.concat_ws(
                    "|", *[F.expr(_spark_render(c, dtypes[c])) for c in cols]
                )
                h = hash_le32_expr(rowstr)
                h2 = hash_le32_expr(F.concat(rowstr, F.lit(":agg")))
                rows = sorted(
                    tuple(r)
                    for r in df.select(
                        (h % 16).alias("shard"), h2.alias("h2")
                    )
                    .groupBy("shard")
                    .agg(
                        F.count(F.lit(1)).alias("n_rows"),
                        F.bit_xor("h2").alias("checksum"),
                        F.sum("h2").alias("hashsum"),
                    )
                    .collect()
                )
                return rows, cols, dtypes

            spark_walls = []
            for _ in range(max(1, args.best_of)):
                ts = time.perf_counter()
                spark_rows, cols, dtypes = _spark_side()
                spark_walls.append(round(time.perf_counter() - ts, 1))
            prior = record.get(name, {}).get("spark_s")
            # `is not None` + floored ratio base: a recorded 0.0 wall must
            # still adjudicate (see sweep_parity.py).
            if (
                prior is not None
                and len(spark_walls) == 1
                and spark_walls[0] > 1.5 * max(prior, 0.1)
            ):
                ts = time.perf_counter()
                spark_rows, cols, dtypes = _spark_side()
                spark_walls.append(round(time.perf_counter() - ts, 1))
            t1 = time.perf_counter()
            duck_render = ", ".join(
                _duck_render(c, dtypes[c]) for c in cols
            )
            oracle_sql = AGG_SQL_OVERRIDES.get(name, spec.sql)
            uf_mode = name in CC_UNION_FIND_ENTRIES
            if uf_mode:
                oracle_sql = rewrite_cc_oracle_with_union_find(con, oracle_sql)
            agg_sql = f"""
            WITH __q AS ({oracle_sql}),
            __r AS (
              SELECT concat_ws('|', {duck_render}) AS rowstr FROM __q
            ), __h AS (
              SELECT CAST(md5_number_upper(rowstr) & 4294967295 AS BIGINT) AS h,
                     CAST(md5_number_upper(rowstr || ':agg') & 4294967295 AS BIGINT) AS h2
              FROM __r
            )
            SELECT CAST(h % 16 AS BIGINT) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   bit_xor(h2) AS checksum,
                   CAST(SUM(h2) AS BIGINT) AS hashsum
            FROM __h GROUP BY 1 ORDER BY 1
            """
            oracle_rows = sorted(tuple(r) for r in con.execute(agg_sql).fetchall())
            t2 = time.perf_counter()
            ok = spark_rows == oracle_rows
            n_total = sum(r[1] for r in spark_rows)
            out[name] = {
                "ok": ok,
                "mode": "aggregate-checksum (shard/count/xor/sum)"
                + (
                    ", gated-form oracle (see AGG_SQL_OVERRIDES)"
                    if name in AGG_SQL_OVERRIDES
                    else ""
                )
                + (
                    ", union-find CC closure (recursive CTE replaced, "
                    "see rewrite_cc_oracle_with_union_find)"
                    if uf_mode
                    else ""
                ),
                "rows": int(n_total),
                "spark_s": min(spark_walls),
                "oracle_s": round(t2 - t1, 1),
                "sec": round(min(spark_walls) + (t2 - t1), 1),
            }
            if len(spark_walls) > 1:
                out[name]["spark_s_runs"] = spark_walls
            if not ok:
                out[name]["detail"] = {
                    "spark": [list(r) for r in spark_rows],
                    "oracle": [list(r) for r in oracle_rows],
                }
            print(
                f"{name}\t{'OK' if ok else 'MISMATCH'}\trows={n_total}\t"
                f"spark={t1-t0:.1f}s oracle={t2-t1:.1f}s",
                flush=True,
            )
        except Exception as e:
            out[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            print(f"{name}\tERR {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
        json.dump(out, open(args.out, "w"), indent=1)
    n_ok = sum(1 for v in out.values() if v.get("ok"))
    print(f"DONE {len(out)} recorded, {n_ok} ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
