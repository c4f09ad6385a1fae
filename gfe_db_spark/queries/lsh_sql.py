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


def probe_unnest_sql(bucket_expr: str, n_planes: int, probe_bits: int) -> str:
    """`unnest([...])` expansion of a bucket into its multi-probe XOR
    neighborhood — mirrors operators/dedup.probe_masks."""
    from gfe_db_spark.operators.dedup import probe_masks

    probes = ", ".join(f"xor({bucket_expr}, {m})" for m in probe_masks(n_planes, probe_bits))
    return f"unnest([{probes}])"
