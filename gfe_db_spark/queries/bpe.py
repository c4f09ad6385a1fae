"""BPE tokenizer-training queries (north-star extension): merge-table
training and resulting-vocabulary stats, each hash-checked against a
DuckDB oracle that unrolls the fixed merge iterations.

Oracle independence: the Spark side merges via a left-to-right fold
(operators/bpe.merge_pair); the oracle implements the same greedy
semantics a completely different way — positions are unnested, maximal
runs of consecutive pair matches are found with gaps-and-islands window
functions, and odd-ranked positions within each run become merge starts
(leftmost-non-overlapping). The two formulations agreeing on every word
is a genuinely independent check, unlike sharing a generator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gfe_db_spark.operators import bpe as BPE
from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table

N_MERGES = 3

_MERGE_SCHEMA = StructType(
    [
        StructField("step", IntegerType(), False),
        StructField("lhs", StringType(), False),
        StructField("rhs", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: 3 merges trained on the documents word
    frequencies. The rows ARE the model (like centroids for IVF) — tiny,
    but each one is the argmax of a corpus-weighted pair count, so the
    hash check covers the full train loop."""
    docs = table(spark, sf_dir, "documents")
    merges, _ = BPE.bpe_train(BPE.word_frequencies(docs), n_merges=N_MERGES)
    return spark.createDataFrame(merges, _MERGE_SCHEMA).orderBy("step")


def bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 subword tokens by weighted frequency AFTER applying the 3
    learned merges — exercises the merge-apply fold over every word."""
    docs = table(spark, sf_dir, "documents")
    _, syms = BPE.bpe_train(BPE.word_frequencies(docs), n_merges=N_MERGES)
    return (
        BPE.symbol_frequencies(syms)
        .select("sym", F.col("freq").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "sym")
        .limit(30)
    )


def _bpe_iteration_sql(prev: str, step: int) -> str:
    """One unrolled BPE iteration: count pairs → pick the (count desc,
    lhs, rhs) argmax → apply it with the gaps-and-islands merge. Emits
    CTEs p{step} (pair counts), b{step} (best pair), w{step} (re-merged
    symbol table)."""
    return f"""
p{step} AS (
  SELECT a, b, SUM(cnt) AS c FROM (
    SELECT cnt, s[i] AS a, s[i + 1] AS b
    FROM (SELECT cnt, s, unnest(range(1, len(s))) AS i FROM {prev} WHERE len(s) > 1)
  ) GROUP BY a, b
), b{step} AS (
  SELECT a, b, c FROM p{step} ORDER BY c DESC, a, b LIMIT 1
), pos{step} AS (
  SELECT word, cnt, i, s[i] AS sym,
         (i < len(s) AND s[i] = bb.a AND s[i + 1] = bb.b) AS m
  FROM (SELECT word, cnt, s, unnest(range(1, len(s) + 1)) AS i FROM {prev})
  CROSS JOIN b{step} bb
), starts{step} AS (
  -- leftmost-non-overlapping: odd rank within each maximal run of
  -- consecutive matches (runs longer than 1 only occur when a = b)
  SELECT word, i FROM (
    SELECT word, i, row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
    FROM (
      SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
      FROM pos{step} WHERE m
    )
  ) WHERE rn % 2 = 1
), w{step} AS (
  SELECT p.word, p.cnt,
         list(CASE WHEN st.i IS NOT NULL THEN bb.a || bb.b ELSE p.sym END
              ORDER BY p.i) AS s
  FROM pos{step} p
  CROSS JOIN b{step} bb
  LEFT JOIN starts{step} st ON st.word = p.word AND st.i = p.i
  LEFT JOIN starts{step} sk ON sk.word = p.word AND sk.i = p.i - 1
  WHERE sk.i IS NULL
  GROUP BY p.word, p.cnt
)"""


_W0 = """
w0 AS (
  SELECT word, COUNT(*) AS cnt,
         list_transform(range(1, length(word) + 1), i -> word[i:i]) AS s
  FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
  )
  GROUP BY word
)"""

_CHAIN = (
    "WITH"
    + _W0
    + ","
    + _bpe_iteration_sql("w0", 1)
    + ","
    + _bpe_iteration_sql("w1", 2)
    + ","
    + _bpe_iteration_sql("w2", 3)
)

BPE_TRAIN_SQL = (
    _CHAIN
    + """
SELECT step, lhs, rhs, pair_count FROM (
  SELECT 1 AS step, a AS lhs, b AS rhs, CAST(c AS BIGINT) AS pair_count FROM b1
  UNION ALL
  SELECT 2, a, b, CAST(c AS BIGINT) FROM b2
  UNION ALL
  SELECT 3, a, b, CAST(c AS BIGINT) FROM b3
)
ORDER BY step
"""
)

BPE_VOCAB_SQL = (
    _CHAIN
    + """
SELECT sym, CAST(SUM(cnt) AS BIGINT) AS freq
FROM (SELECT cnt, unnest(s) AS sym FROM w3)
GROUP BY sym
ORDER BY freq DESC, sym
LIMIT 30
"""
)


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the trained tokenizer: per-document word
    and subword-token counts after the 3 learned merges. The scalable
    apply path: merges are NOT re-derived per occurrence — the symbolized
    word table becomes a vocab-sized (word → n_subtokens) dimension that
    BROADCASTS onto the exploded corpus, so encoding 100 TB is one narrow
    explode + a broadcast join + a keyed count, with the fold applied only
    once per DISTINCT word."""
    docs = table(spark, sf_dir, "documents")
    _, syms = BPE.bpe_train(BPE.word_frequencies(docs), n_merges=N_MERGES)
    wlen = syms.select("word", F.size("s").cast("long").alias("n_sub"))
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(wlen), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subtokens"),
        )
    )


BPE_ENCODE_SQL = (
    _CHAIN
    + """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(w.s)) AS BIGINT) AS n_subtokens
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
) dw
JOIN w3 w USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""
)


QUERIES: dict[str, QuerySpec] = {
    "bpe_encode_corpus": QuerySpec(
        bpe_encode_corpus,
        BPE_ENCODE_SQL,
        "corpus tokenization with the trained BPE vocab as a broadcast dimension",
    ),
    "bpe_train_merges": QuerySpec(
        bpe_train_merges,
        BPE_TRAIN_SQL,
        "BPE merge training (3 unrolled iterations, independent oracle)",
    ),
    "bpe_vocab_stats": QuerySpec(
        bpe_vocab_stats,
        BPE_VOCAB_SQL,
        "subword vocabulary frequencies after applying learned merges",
    ),
}
