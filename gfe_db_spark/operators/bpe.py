"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
training step of an LLM data pipeline, re-expressed as DataFrame ops.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): start from characters, repeatedly (1) count
adjacent symbol pairs across the corpus weighted by word frequency,
(2) merge the most frequent pair everywhere. Training runs on the
*word-frequency table*, not the corpus — the corpus pass is one word-count
aggregation, after which each iteration touches |vocab| rows regardless of
corpus size. That is what makes BPE training feasible at 100 TB: the
heavy input collapses to ~10^6 weighted words before any iteration runs.

Per iteration the plan is: pair explode (narrow) → pair-count aggregate
(one shuffle, map-side partial) → global top-1 (TakeOrdered, 1 row) →
merge applied as a fold over the symbol array (narrow map, pure builtins).
The only driver-side state is the single best pair per iteration — the
same bounded model-state pattern as ivf_train's k×dim centroids.

Merge semantics are the standard greedy left-to-right scan: in a run of
overlapping matches (pair (a,a) in "aaa") the leftmost wins and the next
match starts after it. The fold implements exactly that; the DuckDB
oracle (queries/bpe.py) reimplements it independently via gaps-and-islands
windows, so the two sides share no code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercase alphabetic tokens — the one corpus-wide
    pass; everything after runs on this (small) table."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def chars(col: Column) -> Column:
    """Split a word into its character symbols (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: F.substring(col, i, 1)
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count. Overlapping
    occurrences all count ("aaa" contributes (a,a) twice) — standard BPE
    pair counting."""
    idx = F.sequence(F.lit(1), F.size("s") - 1)
    pairs = syms.filter(F.size("s") > 1).select(
        "cnt",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("s"), i).alias("lhs"),
                    F.element_at(F.col("s"), i + 1).alias("rhs"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")).agg(
        F.sum("cnt").alias("pair_count")
    )


def merge_pair(s: Column, lhs: str, rhs: str) -> Column:
    """Apply one merge greedily left-to-right via a fold: append each
    symbol, but when the accumulator ends in `lhs` and the next symbol is
    `rhs`, replace that tail with the merged token. A symbol produced by
    this very merge never re-merges (its spelling is lhs||rhs, not lhs),
    which is exactly the leftmost-non-overlapping rule."""
    merged = lhs + rhs
    return F.aggregate(
        s,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame, n_merges: int = 3
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merges from a (word, cnt) table. Returns the
    merge list [(step, lhs, rhs, pair_count)...] and the symbolized word
    table after all merges. Ties break lexicographically on (lhs, rhs) so
    training is deterministic and engine-portable. Fixed iteration count,
    driver loop — the repo's established iterative-algorithm shape
    (PageRank in plans/graph_algos.py, Lloyd in operators/similarity.py)."""
    # The corpus collapses to this table ONCE; every iteration (and the
    # final vocab pass) reuses the materialization instead of re-running
    # the corpus word count — at 100 TB this is the difference between
    # n_merges corpus scans and one.
    syms = words.select("word", "cnt", chars(F.col("word")).alias("s")).persist()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["pair_count"])
        merges.append((step, lhs, rhs, cnt))
        syms = syms.withColumn("s", merge_pair(F.col("s"), lhs, rhs))
    return merges, syms


def symbol_frequencies(syms: DataFrame) -> DataFrame:
    """Corpus symbol (subword-token) frequencies after merging — the
    resulting vocabulary weighted by word counts."""
    return (
        syms.select("cnt", F.explode(F.col("s")).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("cnt").alias("freq"))
    )
