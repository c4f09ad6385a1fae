"""Distributed iterative model fitting as DataFrame aggregations.

Gradient-descent logistic regression in the same shape as the engine's
other iterative algorithms (PageRank in plans/graph_algos.py, k-means in
operators/similarity.py): the DATA never leaves the cluster — each step
is one ungrouped aggregate with map-side partials — while the MODEL
(k+1 weights) is bounded driver state, the MLlib pattern.

Two choices make every step bit-deterministic at any parallelism, which
is what lets an iterative float algorithm be hash-checked against a SQL
oracle:

- the "fast sigmoid" ``0.5 + z / (2 * (1 + |z|))`` replaces ``exp`` —
  pure IEEE +,*,/,abs, so Spark's JVM and any oracle engine compute the
  exact same doubles (libm ``exp`` is not correctly rounded and differs
  across engines by 1 ulp, which an iterative loop amplifies);
- gradient sums route per-row contributions through DECIMAL(38,18)
  (exact, order-insensitive addition), the same trick as ``_dsum`` in
  queries/relational.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fast_sigmoid(z: Column) -> Column:
    """Rational sigmoid surrogate: monotone, (0,1)-bounded, exactly 0.5 at
    z=0, and — unlike exp — bit-identical in every IEEE-754 engine."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _linear(w: list[float], feature_cols: list[str]) -> Column:
    """w0 + w1*x1 + ... built left-associatively — the association order is
    part of the cross-engine contract (float addition is not associative)."""
    z = F.lit(w[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return z


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 3,
    lr: float = 0.5,
) -> tuple[list[float], int]:
    """Batch gradient descent from zero weights: per step, one ungrouped
    agg computes n and the k+1 gradient sums (decimal-routed), the driver
    updates k+1 floats. Returns (weights [bias first], n_rows)."""
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    n = 0
    for _ in range(steps):
        resid = fast_sigmoid(_linear(w, feature_cols)) - F.col(label_col)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(resid.cast("decimal(38,18)")).cast("double").alias("g0"),
        ]
        for j, c in enumerate(feature_cols):
            aggs.append(
                F.sum((resid * F.col(c)).cast("decimal(38,18)"))
                .cast("double")
                .alias(f"g{j + 1}")
            )
        row = df.agg(*aggs).collect()[0]
        n = row["n"]
        if n == 0:
            raise ValueError("cannot train on an empty DataFrame")
        w = [w[j] - lr * (row[f"g{j}"] / n) for j in range(k + 1)]
    return w, n


def logreg_fit_summary(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train, then score once more for 0/1 accuracy at the decision
    boundary z > 0. One row out: n, the fitted weights, accuracy."""
    w, _ = train_logreg(df, feature_cols, label_col, steps=steps, lr=lr)
    correct = (_linear(w, feature_cols) > 0) == (F.col(label_col) == F.lit(1.0))
    out = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(correct, 1)).alias("n_correct"),
    )
    cols = [F.col("n")]
    for j, wj in enumerate(w):
        cols.append(F.round(F.lit(wj), 9).alias(f"w{j}"))
    cols.append(
        F.round(
            F.col("n_correct").cast("double") / F.col("n").cast("double"), 9
        ).alias("accuracy")
    )
    return out.select(*cols)
