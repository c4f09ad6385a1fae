#!/usr/bin/env python3
"""Build a scaled test slice by key-offset replication of a smaller one.

This is the committed home of the harness that produced the sf1/sf10
slices behind PARITY_sf1.md / PARITY_sf10_spot.md (previously it lived
in the gitignored `.testdata/` and was lost on re-clone):

    # sf1 = 10x sf0.1
    python tools/make_scaled_sf.py --src /root/testdata/sf0.1 \
        --dst .testdata/sf1 --factor 10
    # sf10 = 10x sf1 (100x bench scale)
    python tools/make_scaled_sf.py --src .testdata/sf1 \
        --dst .testdata/sf10 --factor 10

Replication scheme (the one the committed evidence documents):
  - every fact/entity table is replicated FACTOR times with all key
    columns offset by `replica * (max(key)+1)` of the source slice,
    foreign keys offset by the REFERENCED table's offset so joins stay
    consistent across replicas;
  - payload columns (text, embedding, names, timestamps, prices) are
    copied IDENTICALLY, so documents/embeddings/customer become a
    FACTOR-way exact-duplicated corpus — the adversarial case for every
    pair-producing operator (dedup, ANN, entity matching);
  - the dimension tables region/nation are NOT replicated (they are
    fixed-cardinality dims; nationkey FKs stay valid unchanged).

DuckDB does the replication (columnar read -> cross join with a replica
index -> parquet write); no Spark session needed.
"""
from __future__ import annotations

import argparse
import os

import duckdb

# table -> (own key columns to offset by this table's stride,
#           {fk column -> table whose stride offsets it})
KEYED = {
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": (
        [],
        {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    ),
    "documents": (["doc_id"], {}),
    "embeddings": (["vec_id"], {}),
    "events": (["event_id", "user_id"], {}),
}
DIMS = ("region", "nation")


def stride_of(con: duckdb.DuckDBPyConnection, src: str, table: str) -> dict[str, int]:
    """Per-key stride = max(key)+1 in the source slice."""
    own, _ = KEYED[table]
    cols = list(own)
    strides = {}
    for c in cols:
        (mx,) = con.execute(
            f"SELECT MAX({c}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()
        strides[c] = int(mx) + 1
    return strides


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--threads", type=int, default=16)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")

    # strides for every keyed table (FKs need the referenced stride)
    strides: dict[str, dict[str, int]] = {
        t: stride_of(con, args.src, t) for t in KEYED if KEYED[t][0]
    }
    # referenced-key stride lookup: fk column name -> referenced key stride
    ref_key = {"customer": "c_custkey", "orders": "o_orderkey",
               "part": "p_partkey", "supplier": "s_suppkey"}

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (dim)")

    for t, (own, fks) in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in own:
                s = strides[t][c]
                exprs.append(f"({c} + r.i * {s}) AS {c}")
            elif c in fks:
                rt = fks[c]
                s = strides[rt][ref_key[rt]]
                exprs.append(f"({c} + r.i * {s}) AS {c}")
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        # Cap the parquet row-group size so every table splits into >=32
        # scan tasks: a single-row-group file caps Spark's scan (and every
        # downstream stage pinned to it) at ONE task regardless of
        # local[32] — measured 3x on the document-pipeline entries.
        (src_rows,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.src}/{t}.parquet')"
        ).fetchone()
        rg = max(1024, min(122_880, (src_rows * args.factor) // 32))
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{args.src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({args.factor})) AS i) r) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows (x{args.factor})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
