"""Oracle-parity harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle SQL on the same parquet tables,
then compare row count + schema + order-insensitive values.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from gfe_db_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every parquet table as a view, as the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by stringified values → order-free."""
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for col in df.columns:
        if str(df[col].dtype).startswith("datetime64"):
            df[col] = df[col].astype("datetime64[us]")
    if len(df) == 0:
        return df
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    return df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


@dataclass
class ParityResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_oracle: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.row_count_spark} oracle={self.row_count_oracle}"
        for m in self.mismatches[:8]:
            msg += f"\n    {m}"
        return msg


def _numeric_kind(dtype) -> str:
    """Classify a dtype as 'int' / 'float' / 'other' for strict comparison.

    Only the int-vs-float distinction is enforced: object columns carry
    heterogeneous payloads (Decimal, str, list) whose pandas dtype differs
    legitimately between Spark's toPandas and DuckDB's fetchdf.
    """
    kind = getattr(dtype, "kind", "O")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    return "other"


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> ParityResult:
    sp = _normalize(spark_df.toPandas())
    oc = _normalize(oracle_df)
    res = ParityResult(name, True, len(sp), len(oc))

    if len(sp) != len(oc):
        res.ok = False
        res.mismatches.append(f"row count {len(sp)} != {len(oc)}")
        return res
    if list(sp.columns) != list(oc.columns):
        res.ok = False
        res.mismatches.append(f"columns {list(sp.columns)} != {list(oc.columns)}")
        return res
    for col in sp.columns:
        a, b = sp[col], oc[col]
        kind_a, kind_b = _numeric_kind(a.dtype), _numeric_kind(b.dtype)
        if kind_a != kind_b:
            # The driver's value-hash is dtype-sensitive: an int64 Spark
            # column vs a float64 oracle column hash-mismatches even when
            # every value is equal (how q12 shipped red in round 2). Flag
            # the int-vs-float class locally so it can't pass this gate.
            res.ok = False
            res.mismatches.append(
                f"col {col}: numeric dtype kind differs "
                f"(spark={a.dtype} [{kind_a}] vs oracle={b.dtype} [{kind_b}])"
            )
            continue
        a_na, b_na = a.isna(), b.isna()
        if not a_na.equals(b_na):
            res.ok = False
            res.mismatches.append(f"col {col}: null pattern differs")
            continue
        mask = ~a_na
        av = a[mask].to_numpy()
        bv = b[mask].to_numpy()
        try:
            import numpy as np

            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                neq = av.astype(float) != bv.astype(float)
            else:
                neq = np.array([str(x) != str(y) for x, y in zip(av, bv)])
        except Exception as e:  # pragma: no cover
            res.ok = False
            res.mismatches.append(f"col {col}: compare error {e}")
            continue
        if neq.any():
            import numpy as np

            idx = int(np.argmax(neq))
            res.ok = False
            n_bad = int(neq.sum())
            res.mismatches.append(
                f"col {col}: {n_bad} value diffs; first at #{idx}: "
                f"spark={av[idx]!r} oracle={bv[idx]!r}"
            )
    return res


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    """Run every registered query against its oracle at sf_dir."""
    from gfe_db_spark.queries import all_queries

    con = duckdb_connection(sf_dir)
    results = []
    for name, spec in all_queries().items():
        if names is not None and name not in names:
            continue
        if spec.sql is None:
            continue
        spark_df = spec.fn(spark, sf_dir)
        oracle_df = con.execute(spec.sql).fetchdf()
        results.append(compare(name, spark_df, oracle_df))
    return results
