"""Salted-join / salted-distinct correctness: results must be identical to
the unsalted forms on a deliberately skewed dataset (90% one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfe_db_spark.operators.skew import salted_count_distinct, salted_join, skew_stats


@pytest.fixture(scope="module")
def skewed(spark):
    # 9000 rows on key 1, ~1000 spread over keys 2..11
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9000, F.lit(1))
        .otherwise((F.col("id") % 10 + 2))
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(12).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return df, dim


def test_skew_stats(spark, skewed):
    df, _ = skewed
    top = skew_stats(df, "k", top=1).collect()[0]
    assert top["k"] == 1 and top["n"] == 9000 and abs(top["share"] - 0.9) < 1e-9


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, skewed, how):
    df, dim = skewed
    plain = df.join(dim, "k", how).orderBy("v").collect()
    salted = salted_join(df, dim, "k", salt=8, how=how).orderBy("v").collect()
    assert [r.asDict() for r in salted] == [r.asDict() for r in plain]


def test_salted_join_rejects_right(spark, skewed):
    df, dim = skewed
    with pytest.raises(ValueError):
        salted_join(df, dim, "k", how="right")


def test_salted_count_distinct_exact(spark, skewed):
    df, _ = skewed
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"] for r in salted_count_distinct(df, "k", "v").collect()
    }
    assert salted == plain
