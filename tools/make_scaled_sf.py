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

Mixed-duplication mode (r10 verdict item 3): `--mode mixed` builds a
slice whose duplication is SKEWED and partly NEAR-duplicate instead of
the uniform exact replication above — the adversarial case for the
duplication-adaptive plan choosers (`queries.dedup._use_digest_gate`
and friends), which the uniform slices only exercise at the extremes:

  - `documents` / `customer` / `embeddings` get a Zipf head: the H
    hash-ranked head rows are replicated max(2, C//rank) times (a few
    large classes, a long all-distinct tail), with C solved so the
    slice's distinct-text ratio lands near `--target-ratio` (default
    0.94, just below the 0.95 gate threshold);
  - every 5th replica of a head row is a NEAR-dup variant (token-level
    edit for text/name, distinct digest) rather than an exact copy, so
    MinHash/LSH/entity matching see organic near-duplicate families,
    not just exact classes;
  - keys are offset by `replica * stride` exactly like the uniform
    mode; every other table is copied unchanged, so the dst dir is a
    complete, FK-consistent sf dir any registered entry can run on.

    python tools/make_scaled_sf.py --mode mixed \
        --src /root/testdata/sf0.1 --dst .testdata/sfmix
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
        if mx is None:
            raise SystemExit(
                f"{table}.{c}: source table is empty (MAX is NULL) — "
                "cannot derive a replication stride; remove the table from "
                "KEYED or supply a non-empty source slice"
            )
        strides[c] = int(mx) + 1
    return strides


def check_fk_bounds(
    con: duckdb.DuckDBPyConnection,
    src: str,
    table: str,
    fk: str,
    ref_table: str,
    ref_stride: int,
) -> None:
    """The offset scheme assumes every FK value < the referenced table's
    stride; a violated input would silently produce cross-replica key
    collisions, so fail loudly instead."""
    (mx,) = con.execute(
        f"SELECT MAX({fk}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()
    if mx is not None and int(mx) >= ref_stride:
        raise SystemExit(
            f"{table}.{fk}: max FK value {mx} >= referenced {ref_table} "
            f"stride {ref_stride}; replication would collide keys across "
            "replicas"
        )


# mixed-mode per-table recipe: (key column, payload column to judge
# distinctness by, SQL template for the near-dup variant of that payload,
# SQL template for the --prescale distinctifying edit)
_MIXED = {
    "documents": (
        "doc_id",
        "text",
        # interior token edit: replace the 3rd whitespace token with a
        # replica-indexed marker (regexp no-match on <3-token docs falls
        # back to an exact copy — the achieved ratio is measured, not
        # assumed)
        r"regexp_replace(text, '^((?:\S+\s+){2})\S+', "
        r"'\1nd' || CAST(r.i AS VARCHAR))",
        # prescale edit: APPEND a marker token (position disjoint from the
        # variant edit so prescale replicas of the same doc landing in two
        # head classes cannot produce identical variants)
        "text || ' u' || CAST(p.j AS VARCHAR)",
    ),
    "customer": (
        "c_custkey",
        "c_name",
        # last-character edit: levenshtein distance 1 from the head name,
        # the shape entity matching's delete-neighborhood must catch
        "substr(c_name, 1, len(c_name) - 1) || chr(CAST(65 + r.i % 26 AS INTEGER))",
        "c_name || ' u' || CAST(p.j AS VARCHAR)",
    ),
    # embeddings: exact-copy classes only (no variant expression) — array
    # payloads dedup by exact equality; prescale perturbs one coordinate
    "embeddings": (
        "vec_id",
        "embedding",
        None,
        "CAST(list_transform(range(1, len(embedding) + 1), "
        "q -> CASE WHEN q = 1 THEN embedding[1] + 0.001 * p.j "
        "ELSE embedding[q] END) AS FLOAT[])",
    ),
}


def zipf_head_scale(n_rows: int, head: int, target_ratio: float, with_variants: bool) -> int:
    """Solve the Zipf scale C so distinct/total lands near target_ratio.

    total T = (N - H) + S, distinct D = N + V where S = sum of head
    class sizes and V ~= S/5 when every 5th replica is a distinct
    variant (V = 0 for exact-only tables). From D = ratio * T:
        S = (N*(1-r) + r*H) / (r - v)   with v = 1/5 or 0.
    C then scales the harmonic head: S = C * H_head.
    """
    v = 0.2 if with_variants else 0.0
    s = (n_rows * (1.0 - target_ratio) + target_ratio * head) / (target_ratio - v)
    harmonic = sum(1.0 / j for j in range(1, head + 1))
    return max(head + 1, int(s / harmonic))


def zipf_text_expr(vocab: int, doc_id_col: str = "s.doc_id",
                   text_col: str = "s.text") -> str:
    """SQL that REWRITES a document's text as a deterministic Zipf-vocab
    token sequence (same token count as the source text).

    Why (r11 verdict missing item 2 / next-round item 3): the driver's
    synthetic corpus draws from ~30 words, so its 3-gram vocabulary is
    tiny (38k shingles, max df 392, every df the same order of
    magnitude) — Σdf² dominates exact Jaccard in a regime no real corpus
    has, and a benchmark SAMPLE's shingles cover every document (which
    degenerated corpus_prep_pipeline_v2 to 0 rows on the large mixed
    slice). A Zipf(1) vocabulary gives the df spectrum real text has:
    a handful of stopword-like trigrams with df in the thousands, a long
    df-1 tail, max-df spanning decades.

    Sampling is the exact inverse-CDF of Zipf s=1 (CDF(r) ≈ ln r / ln V):
    rank = exp(u·ln V) with u hashed from (doc_id, position) via the
    repo's md5-LE32 contract — fully deterministic, no RNG state, so
    regeneration is reproducible byte-for-byte."""
    u = (
        f"((md5_number_upper(CAST({doc_id_col} AS VARCHAR) || ':' || "
        f"CAST(p AS VARCHAR) || ':zt') & 4294967295) + 0.5) / 4294967296.0"
    )
    rank = (
        f"least({vocab}, greatest(1, "
        f"CAST(floor(exp(({u}) * ln({vocab}))) AS BIGINT)))"
    )
    return (
        "array_to_string(list_transform("
        f"range(1, len(string_split_regex({text_col}, '\\s+')) + 1), "
        f"p -> 'tok' || CAST({rank} AS VARCHAR)), ' ')"
    )


def make_mixed(
    src: str,
    dst: str,
    target_ratio: float = 0.94,
    head: int | None = None,
    threads: int = 16,
    prescale: int = 1,
    zipf_vocab: int = 0,
    doc_head: int | None = None,
) -> dict[str, dict]:
    """Build the mixed-duplication slice; returns per-table achieved stats
    ({table: {rows, distinct_payload, ratio, head, zipf_c}}) so callers
    (and the gate-chooser test) can pin behavior against ACTUAL stats.

    ``prescale`` > 1 first expands each duplicated table P-way with
    ALL-DISTINCT edited payloads (append-token / coordinate-perturb) and
    P-offset keys, THEN applies the Zipf head on the expanded set — the
    way to build a LARGE near-threshold slice from a small distinct
    source (a 10x uniform slice like sf1 is already 10-way exact-dup, so
    mixing on top of it can only reach ratio ~= 1/10).

    ``zipf_vocab`` > 0 first rewrites every SOURCE document's text as a
    deterministic Zipf(1)-vocabulary token sequence (see zipf_text_expr)
    before the prescale/head stages, so near-dup families and markers
    layer on top of a realistic shingle-df spectrum."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    stats: dict[str, dict] = {}

    doc_src = f"read_parquet('{src}/documents.parquet')"
    if zipf_vocab > 0:
        synth = zipf_text_expr(zipf_vocab)
        con.execute(
            f"""
            CREATE TEMP TABLE zipf_src AS
            SELECT s.doc_id, {synth} AS text, s.lang, s.source,
                   len({synth}) AS n_chars
            FROM read_parquet('{src}/documents.parquet') s
            """
        )
        doc_src = "zipf_src"

    src_tables = [t for t in list(KEYED) + list(DIMS)]
    for t in src_tables:
        if t not in _MIXED:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        key, payload, variant_sql, prescale_sql = _MIXED[t]
        src_rel = doc_src if t == "documents" else f"read_parquet('{src}/{t}.parquet')"
        (n_src,) = con.execute(f"SELECT COUNT(*) FROM {src_rel}").fetchone()
        if n_src == 0:
            raise SystemExit(f"{t}: empty source table")
        n_rows = n_src * prescale
        # documents-only head override: fewer/larger head classes push the
        # max shingle-df past 3 decades (max df ≈ zipf_c + base trigram
        # overlap) without touching the customer/embeddings class spectra
        h = doc_head if (t == "documents" and doc_head is not None) else (
            head if head is not None else max(6, n_rows // 500)
        )
        c = zipf_head_scale(n_rows, h, target_ratio, variant_sql is not None)
        (mx,) = con.execute(f"SELECT MAX({key}) FROM {src_rel}").fetchone()
        stride = int(mx) + 1

        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src_rel}").fetchall()
        ]
        # stage 1: the prescaled, all-distinct-payload base (`pre`)
        pre_exprs = []
        for col in cols:
            if col == key:
                pre_exprs.append(f"(s.{col} + p.j * {stride}) AS {col}")
            elif col == payload and prescale > 1:
                pre_exprs.append(
                    f"CASE WHEN p.j = 0 THEN s.{col} ELSE {prescale_sql} "
                    f"END AS {col}"
                )
            elif col == "n_chars" and t == "documents" and prescale > 1:
                pre_exprs.append(
                    f"len(CASE WHEN p.j = 0 THEN s.text ELSE {prescale_sql} "
                    "END) AS n_chars"
                )
            else:
                pre_exprs.append(f"s.{col}")
        # bare payload names inside the templates resolve against the sole
        # row source of each stage (parquet `s` / CTE `d`) — no aliasing
        pre_sel = ", ".join(pre_exprs)
        pre_stride = stride * prescale

        # stage 2: Zipf replication with near-dup variants over `pre`
        exprs = []
        for col in cols:
            if col == key:
                exprs.append(f"(d.{col} + r.i * {pre_stride}) AS {col}")
            elif col == payload and variant_sql is not None:
                exprs.append(
                    f"CASE WHEN r.i > 0 AND r.i % 5 = 1 THEN {variant_sql} "
                    f"ELSE d.{col} END AS {col}"
                )
            elif col == "n_chars" and t == "documents":
                # keep the derived length honest on variant rows
                exprs.append(
                    "len(CASE WHEN r.i > 0 AND r.i % 5 = 1 THEN "
                    f"{variant_sql} ELSE d.text END) AS n_chars"
                )
            else:
                exprs.append(f"d.{col}")
        sel = ", ".join(exprs)
        rg = max(1024, min(122_880, n_rows // 16))
        con.execute(
            f"""
            COPY (
              WITH pre AS (
                SELECT {pre_sel}
                FROM {src_rel} s
                CROSS JOIN (SELECT unnest(range({prescale})) AS j) p
              ), ranked AS (
                SELECT {key} AS k,
                       row_number() OVER (
                         ORDER BY md5(CAST({key} AS VARCHAR))) AS rnk
                FROM pre
              ), counts AS (
                SELECT k,
                       CASE WHEN rnk <= {h}
                            THEN greatest(2, {c} // rnk)
                            ELSE 1 END AS n_copies
                FROM ranked
              )
              SELECT {sel}
              FROM pre d
              JOIN counts ON counts.k = d.{key}
              CROSS JOIN LATERAL (
                SELECT unnest(range(counts.n_copies)) AS i) r
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})
            """
        )
        pc = payload if payload != "embedding" else "CAST(embedding AS VARCHAR)"
        n, nd = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {pc}) "
            f"FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        stats[t] = {
            "rows": int(n),
            "distinct_payload": int(nd),
            "ratio": round(nd / n, 4),
            "head": h,
            "zipf_c": c,
        }
        if t == "documents":
            # 3-gram shingle df spectrum — the regime knob the Zipf vocab
            # exists to control. Slicing matches the oracles EXACTLY
            # (toks[i:i+2] is 3 tokens — DuckDB slices are inclusive); a
            # hand-rolled variant undercounted 10x once.
            max_df, n_sh, sum_df2 = con.execute(
                rf"""
                WITH t AS (
                  SELECT doc_id, string_split_regex(text, '\s+') AS toks
                  FROM read_parquet('{dst}/documents.parquet')
                ), sh AS (
                  SELECT DISTINCT doc_id, shingle FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                             range(1, greatest(len(toks) - 1, 1)),
                             i -> array_to_string(toks[i:i+2], ' '))) AS shingle
                    FROM t
                  )
                ), df AS (
                  SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
                )
                SELECT MAX(df), COUNT(*), SUM(df * df) FROM df
                """
            ).fetchone()
            stats[t].update(
                {
                    "shingle_max_df": int(max_df),
                    "distinct_shingles": int(n_sh),
                    "shingle_sum_df2": int(sum_df2),
                    "zipf_vocab": zipf_vocab,
                }
            )
        print(f"{t}: {n} rows, distinct({payload})={nd}, ratio={nd/n:.4f} "
              f"(head={h}, C={c})")
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--mode", choices=["uniform", "mixed"], default="uniform")
    ap.add_argument("--target-ratio", type=float, default=0.94)
    ap.add_argument("--head", type=int, default=None)
    ap.add_argument(
        "--prescale",
        type=int,
        default=1,
        help="mixed mode: expand the source P-way with all-distinct edited "
        "payloads BEFORE the Zipf head (build large near-threshold slices "
        "from a small distinct source)",
    )
    ap.add_argument(
        "--doc-head",
        type=int,
        default=None,
        help="mixed mode: head-class count for the documents table only "
        "(other tables keep --head / the n//500 default)",
    )
    ap.add_argument(
        "--zipf-text",
        type=int,
        default=0,
        metavar="VOCAB",
        help="mixed mode: rewrite source document text as deterministic "
        "Zipf(1)-vocabulary token sequences of this vocabulary size "
        "before replication — gives the shingle-df spectrum real corpora "
        "have (decades of df range) instead of the driver corpus's "
        "~30-word vocabulary",
    )
    args = ap.parse_args()
    if args.mode == "mixed":
        stats = make_mixed(
            args.src, args.dst, args.target_ratio, args.head, args.threads,
            args.prescale, args.zipf_text, args.doc_head,
        )
        with open(os.path.join(args.dst, "_mixed_stats.json"), "w") as f:
            import json

            json.dump(stats, f, indent=1)
        return 0
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
        for fk, rt in fks.items():
            check_fk_bounds(con, args.src, t, fk, rt, strides[rt][ref_key[rt]])
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
