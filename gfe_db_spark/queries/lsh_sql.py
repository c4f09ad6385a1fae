"""Shared DuckDB-SQL fragments mirroring the sign-LSH operators: the
oracle regenerates the identical hash-derived hyperplanes
(operators/similarity.hyperplane) and XOR probe masks
(operators/dedup.probe_masks), so bucketed Spark plans hash-check exactly.
"""

from __future__ import annotations


def bucket_int_sql(vec_expr: str, n_planes: int = 8, dim: int = 64) -> str:
    """Integer sign-LSH bucket of `vec_expr` (a DOUBLE[] SQL expression):
    bit p set iff dot(v, hyperplane(p)) >= 0 — mirrors
    operators/similarity.hyperplane_bucket_id."""
    from gfe_db_spark.operators.similarity import hyperplane

    terms = []
    for p in range(n_planes):
        plane = ", ".join(repr(x) for x in hyperplane(p, dim))
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, [{plane}]) >= 0 THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


def projection_list_sql(
    vec_expr: str, out_dim: int = 16, dim: int = 64, plane_offset: int = 1000
) -> str:
    """DOUBLE[] SQL expression for the JL projection of `vec_expr` —
    mirrors operators/similarity.random_projection (same md5-derived
    matrix rows, same sqrt(3/out_dim) scale)."""
    import math

    from gfe_db_spark.operators.similarity import hyperplane

    s = repr(math.sqrt(3.0 / out_dim))
    rows = []
    for j in range(out_dim):
        plane = ", ".join(repr(x) for x in hyperplane(plane_offset + j, dim))
        rows.append(f"list_dot_product({vec_expr}, [{plane}]) * {s}")
    return "[" + ", ".join(rows) + "]"


def probe_unnest_sql(bucket_expr: str, n_planes: int, probe_bits: int) -> str:
    """`unnest([...])` expansion of a bucket into its multi-probe XOR
    neighborhood — mirrors operators/dedup.probe_masks."""
    from gfe_db_spark.operators.dedup import probe_masks

    probes = ", ".join(f"xor({bucket_expr}, {m})" for m in probe_masks(n_planes, probe_bits))
    return f"unnest([{probes}])"
