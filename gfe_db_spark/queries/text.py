"""Text-analysis query inventory over `documents` (north-star extension:
language ID, quality scoring, token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfe_db_spark.operators import spread_small_input
from gfe_db_spark.operators import text as TX
from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    out = TX.token_stats(docs)
    return out.select("doc_id", "n_tokens", "n_tokens_bpe")


TEXT_TOKEN_SQL = r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens_bpe
FROM documents ORDER BY doc_id
"""


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (r13, measured both ways): a doc_id-keyed input spread
    # wins only in the near-single-split regime (sf0.1: 0.47 -> 0.32 s)
    # and LOSES once the scan has a dozen splits (sf1: 0.42 -> 0.57 s) —
    # for a pure narrow map the exchange's serialization buys nothing
    # that the scan's own splits don't already provide. Contrast
    # text_redact_pii (heavy enough per byte to win at both scales) and
    # repetition_stats (its aggs absorb the exchange).
    docs = table(spark, sf_dir, "documents")
    out = TX.quality_features(docs)
    return out.select(
        "doc_id", "n_chars_m", "n_tokens", "punct_ratio", "upper_ratio", "stopword_ratio"
    )


_STOPWORDS = ", ".join(
    f"'{w}'" for ws in TX.LANG_MARKERS.values() for w in ws
)

TEXT_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(text, '\s+') AS toks FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
             / greatest(length(text), 1), 9) AS punct_ratio,
       round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
             / greatest(length(text), 1), 9) AS upper_ratio,
       round(len(list_intersect(toks, [{_STOPWORDS}])) / greatest(len(toks), 1), 9) AS stopword_ratio
FROM t ORDER BY doc_id
"""


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (C4/RefinedWeb-style domain balancing): keep at most
    K=5 documents per `source`, ranked by quality — here the exact integer
    stopword-hit count (the proxy TEXT_QUALITY already mirrors in SQL), so
    no float can reorder the cut — with a doc_id tie-break. Stops a
    crawl's dominant domains from swamping the training mixture.

    Plan at scale: a narrow map computes the score, then rank ≤ K over a
    source-keyed window. Spark compiles the rank filter into
    WindowGroupLimit, which keeps a running top-K per partition BEFORE the
    shuffle — so each task ships at most K rows per domain, and a
    billion-doc domain costs the shuffle K rows, not a full stratum sort."""
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    stopwords = F.array(
        *[F.lit(w) for ws in TX.LANG_MARKERS.values() for w in ws]
    )
    toks = F.split(F.col("text"), r"\s+")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.array_intersect(toks, stopwords)).cast("long").alias("stop_hits"),
    )
    w = W.partitionBy("source").orderBy(F.desc("stop_hits"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .orderBy("source", "rank")
    )


DOMAIN_CAP_SQL = rf"""
WITH s AS (
  SELECT source, doc_id,
         CAST(len(list_intersect(string_split_regex(text, '\s+'),
                                 [{_STOPWORDS}])) AS BIGINT) AS stop_hits
  FROM documents
), r AS (
  SELECT source, doc_id, stop_hits,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY stop_hits DESC, doc_id
         ) AS INT) AS rank
  FROM s
)
SELECT source, doc_id, stop_hits, rank FROM r
WHERE rank <= 5 ORDER BY source, rank
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic vs the labeled lang column."""
    # NOT spread — same measured trade as text_quality_scores above
    # (sf0.1 win, sf1 loss; pure narrow map)
    docs = table(spark, sf_dir, "documents")
    out = TX.lang_scores(docs)
    return out.select("doc_id", "lang", "lang_pred", "lang_score")


def _lang_scores_sql() -> str:
    per_lang = []
    for lang, markers in TX.LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        per_lang.append(f"CAST(len(list_intersect(toks, [{arr}])) AS BIGINT) AS s_{lang}")
    scores = ",\n       ".join(per_lang)
    # tie-break mirrors Spark's array_max over (score, lang) structs:
    # highest score wins, lexicographically larger lang wins ties.
    langs_desc = sorted(TX.LANG_MARKERS, reverse=True)
    case = " ".join(f"WHEN s_{lg} = best THEN '{lg}'" for lg in langs_desc)
    greatest = ", ".join(f"s_{lg}" for lg in TX.LANG_MARKERS)
    return rf"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
       {scores}
  FROM t
), b AS (
  SELECT *, greatest({greatest}) AS best FROM s
)
SELECT doc_id, lang,
       CASE WHEN best = 0 THEN 'und' {case} END AS lang_pred,
       best AS lang_score
FROM b ORDER BY doc_id
"""


TEXT_LANG_SQL = _lang_scores_sql()


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return TX.fingerprint(docs, k=4, id_col="doc_id").select("doc_id", "fingerprint")


TEXT_FINGERPRINT_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
)
SELECT doc_id,
       list_min(list_transform(range(1, greatest(len(toks) - 2, 1)),
                i -> md5(array_to_string(toks[i:i+3], ' ')))) AS fingerprint
FROM t ORDER BY doc_id
"""


def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split over documents: per-split doc and
    char totals (the reproducibility contract a training pipeline needs —
    same assignment on every engine that has md5)."""
    docs = table(spark, sf_dir, "documents")
    out = TX.deterministic_split(docs)
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
        .orderBy("split")
    )


TEXT_SPLIT_SQL = """
WITH b AS (
  SELECT n_chars,
         CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':v1') & 4294967295 AS BIGINT)
           % 10000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY split
ORDER BY split
"""


def text_vocab_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build: top-200 tokens by corpus frequency (word-count
    shape: map-side partial aggregation, one shuffle on token)."""
    docs = table(spark, sf_dir, "documents")
    return TX.vocab_top_tokens(docs, k=200)


TEXT_VOCAB_SQL = r"""
SELECT tok AS token, COUNT(*) AS freq
FROM documents,
     unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(tok)
GROUP BY tok
ORDER BY freq DESC, token
LIMIT 200
"""


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents: typed sentinels + per-kind hit counts.
    The corpus is synthetic prose (hits are usually 0) — the contract
    checked is the redaction transform itself, byte-for-byte vs the
    oracle running the same regexes."""
    # doc_id-keyed spread (r13): the six regex passes are the heaviest
    # narrow map in the text family — heavy enough per byte that the
    # spread wins at BOTH measured scales (sf0.1: 0.64 -> 0.31 s, sf1:
    # 0.76 -> 0.68 s), unlike the lighter lang_id/quality maps above.
    # No-op at cluster scale (inputs arrive with >= parallelism splits).
    docs = spread_small_input(table(spark, sf_dir, "documents"), key="doc_id")
    return (
        TX.redact_pii(docs)
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_url",
            F.md5(F.col("text_redacted")).alias("redacted_hash"),
        )
    )


def _redact_sql() -> str:
    from gfe_db_spark.operators.text import PII_PATTERNS

    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    red = "text"
    for kind, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{kind.upper()}>', 'g')"
    return f"""
SELECT doc_id,
       {counts},
       md5({red}) AS redacted_hash
FROM documents
ORDER BY doc_id
"""


TEXT_REDACT_SQL = _redact_sql()


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM build: top-3 next tokens per token (count ≥ 2)."""
    docs = table(spark, sf_dir, "documents")
    return TX.bigram_next_tokens(docs, k=3, min_count=2).orderBy("w1", "rank")


TEXT_BIGRAM_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> [toks[i], toks[i + 1]])) AS pair
  FROM t
), pairs AS (
  SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS n
  FROM bg
  WHERE pair[1] <> '' AND pair[2] <> ''
  GROUP BY pair[1], pair[2]
  HAVING COUNT(*) >= 2
)
SELECT w1, w2, n,
       CAST(row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2) AS INT) AS rank
FROM pairs
QUALIFY rank <= 3
ORDER BY w1, rank
"""


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus subsample (hash-gated, engine-portable):
    the reproducible alternative to df.sample() for training-data cuts."""
    docs = table(spark, sf_dir, "documents")
    return (
        TX.deterministic_sample(docs, rate_bp=1000)
        .select("doc_id", "n_chars")
    )


CORPUS_SAMPLE_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':smp') & 4294967295 AS BIGINT)
      % 10000 < 1000
ORDER BY doc_id
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (inverted-index build shape)."""
    docs = table(spark, sf_dir, "documents")
    return TX.tfidf_top_terms(docs, k=3)


TEXT_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok AS term
  FROM documents,
       unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(tok)
), pairs AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         round(p.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1), 9) AS tfidf
  FROM pairs p JOIN dfreq d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
FROM scored
QUALIFY rank <= 3
ORDER BY doc_id, rank
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-token
    fraction and most-frequent-bigram share — the quality gate that
    catches looping machine-generated text."""
    docs = table(spark, sf_dir, "documents")
    return TX.repetition_stats(docs)


TEXT_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), base AS (
  SELECT doc_id, toks, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct
  FROM t WHERE len(toks) >= 1
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM base WHERE n_tokens >= 2
), bc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
), mx AS (
  SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY 1
)
SELECT b.doc_id,
       b.n_tokens,
       round(1.0 - b.n_distinct / CAST(b.n_tokens AS DOUBLE), 6) AS dup_token_frac,
       round(CAST(m.top_bigram_n AS DOUBLE) / (b.n_tokens - 1), 6) AS top_bigram_frac
FROM base b LEFT JOIN mx m USING (doc_id)
ORDER BY b.doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling rates (mixture rebalancing):
    the head language is downsampled, scarce languages kept at higher
    rates — same engine-portable hash gate as corpus_sample."""
    docs = table(spark, sf_dir, "documents")
    return TX.stratified_sample(docs).select("doc_id", "lang", "n_chars")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':strat') & 4294967295 AS BIGINT)
      % 10000 <
      CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 2500 WHEN 'es' THEN 2500
                WHEN 'de' THEN 2500 WHEN 'fr' THEN 2500 ELSE 5000 END
ORDER BY doc_id
"""


def fixed_k_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling (k=20 docs per language): rank every
    doc inside its stratum by the engine-portable hash and keep rank ≤ k.
    The eval-set builder's shape — rate-based sampling (stratified_sample)
    can't promise a count, this promises EXACTLY min(k, |stratum|), still
    fully deterministic and reproducible on any engine with md5.

    Scale: one shuffle keyed by the stratum, per-stratum top-k inside the
    window (bounded state k per group); for strata too large to sort, the
    two-pass refinement is: hash-gate to ~4k survivors at a rate estimated
    from stratum counts, then window the survivors — same answer,
    sort cost O(4k log 4k) per stratum."""
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    h = TX.hash_le32("doc_id", "fixk")
    w = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


FIXED_K_SAMPLE_SQL = """
SELECT doc_id, lang, rk FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':fixk')
                         & 4294967295 AS BIGINT) ASC, doc_id ASC
         ) AS rk
  FROM documents
)
WHERE rk <= 20
ORDER BY lang, rk
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: hash-sharded, per-shard window
    cumsum assigns every document a (shard, pack_id) under a 512-token
    budget, flagging documents split by a chunk boundary."""
    from gfe_db_spark.operators.packing import pack_sequences as pack

    docs = table(spark, sf_dir, "documents")
    return pack(docs, max_tokens=512, n_shards=32)


PACK_SEQUENCES_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':pack') & 4294967295 AS BIGINT)
           % 10000 % 32 AS shard,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
       (n_tokens > 0 AND FLOOR((cum - 1) / 512.0) > FLOOR((cum - n_tokens) / 512.0))
         AS crosses_boundary
FROM c ORDER BY doc_id
"""


def quality_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles (NTILE) with per-decile stats — the
    feature-binning step of a quality-stratified corpus cut. Deterministic
    tie-break on doc_id inside the window; one keyed window + one keyed
    agg.

    Scale note: exact NTILE sorts each stratum in one task, which is fine
    while strata are bounded (a handful of languages) but a bottleneck if
    a stratum holds billions of rows. The scale path swaps the window for
    approx_percentile decile BOUNDARIES (a JVM sketch, one pass) plus a
    width-bucket comparison — same output shape, sketch-accuracy contract
    as in sketch_quantile_accuracy."""
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        docs.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "decile")
    )


QUALITY_DECILE_SQL = """
SELECT lang, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM (
  SELECT lang, n_chars,
         CAST(NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INTEGER)
           AS decile
  FROM documents
)
GROUP BY lang, decile
ORDER BY lang, decile
"""


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (CCNet-style quality filter)
    with the corpus itself as the model."""
    docs = table(spark, sf_dir, "documents")
    return TX.lm_cross_entropy(docs)


TEXT_LM_SCORE_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
), bg0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS sh
  FROM t
), bg AS (
  SELECT doc_id, split_part(sh, ' ', 1) AS w1, split_part(sh, ' ', 2) AS w2
  FROM bg0 WHERE split_part(sh, ' ', 1) <> '' AND split_part(sh, ' ', 2) <> ''
), c_ab AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2
), c_a AS (
  SELECT w1, SUM(c_ab) AS c_a FROM c_ab GROUP BY 1
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(AVG(ln(c_a.c_a) - ln(c_ab.c_ab)), 6) AS avg_neg_logp
FROM bg JOIN c_ab USING (w1, w2) JOIN c_a USING (w1)
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap (200-char windows, stride
    150): sequence→explode→substr, all integer arithmetic — the
    pre-tokenization splitter of a training pipeline."""
    docs = table(spark, sf_dir, "documents")
    return TX.chunk_documents(docs, chunk_chars=200, stride=150)


DOC_CHUNK_SQL = """
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= 200 THEN CAST(0 AS BIGINT)
              ELSE CAST((length(text) - 200 + 149) // 150 AS BIGINT) END AS extra
  FROM documents
), e AS (
  SELECT doc_id, text, extra + 1 AS n_chunks,
         unnest(generate_series(CAST(0 AS BIGINT), extra)) AS chunk_idx
  FROM d
)
SELECT doc_id, chunk_idx, n_chunks,
       substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200) AS chunk_text,
       CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS BIGINT)
         AS chunk_len
FROM e ORDER BY doc_id, chunk_idx
"""


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing sized from the data itself: integer
    capacity math finds the largest corpus whose target mixture fits in
    every domain, then the portable hash gate keeps exactly that share —
    agg → broadcast rates → narrow filter (see operators.text
    .mixture_resample for the scale notes)."""
    docs = table(spark, sf_dir, "documents")
    return (
        TX.mixture_resample(docs)
        .select("doc_id", "source", "rate_bp")
    )


MIXTURE_RESAMPLE_SQL = """
WITH w AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN 6 ELSE 1 END AS weight
  FROM documents GROUP BY source
), tot AS (SELECT SUM(weight) AS w_total FROM w),
sized AS (
  SELECT w.*, t.w_total, (n_docs * t.w_total) // weight AS capacity FROM w, tot t
), tt AS (SELECT MIN(capacity) AS t_total FROM sized),
rates AS (
  SELECT source,
         CAST((((t.t_total * weight) // w_total) * 10000) // n_docs AS BIGINT)
           AS rate_bp
  FROM sized, tt t
)
SELECT d.doc_id, d.source, r.rate_bp
FROM documents d JOIN rates r USING (source)
WHERE CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':mix') & 4294967295 AS BIGINT)
      % 10000 < r.rate_bp
ORDER BY d.doc_id
"""


def weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling): top-100 docs by priority = n_chars / hash-uniform. The
    priority is one IEEE division of exact integers — bit-identical on
    every engine, so selection AND the reported priority hash-match."""
    docs = table(spark, sf_dir, "documents")
    out = TX.priority_sample(docs, weight_col="n_chars", k=100)
    return out.select("doc_id", "weight", "priority").orderBy(
        F.desc("priority"), "doc_id"
    )


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars AS weight,
       CAST(n_chars AS DOUBLE)
         / CAST((md5_number_upper(CAST(doc_id AS VARCHAR) || ':wps')
                 & 4294967295) + 1 AS DOUBLE) AS priority
FROM documents
ORDER BY priority DESC, doc_id
LIMIT 100
"""


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: per-doc mean unigram log-likelihood
    ratio of the target domain (lang='en') vs the whole corpus."""
    docs = table(spark, sf_dir, "documents")
    out = TX.dsir_weights(docs, target_pred=F.col("lang") == "en")
    return out.select("doc_id", "n_toks", "dsir_score", "is_target_like")


DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target, tok
  FROM documents,
       unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(tok)
), stats AS (
  SELECT tok, COUNT(*) AS sc,
         COALESCE(SUM(CASE WHEN is_target THEN 1 ELSE 0 END), 0) AS tc
  FROM toks GROUP BY tok
), scored AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_toks,
         round(AVG(ln((s.tc + 1) / (s.sc + 1))), 6) AS dsir_score
  FROM toks t JOIN stats s USING (tok)
  GROUP BY t.doc_id
)
SELECT doc_id, n_toks, dsir_score, dsir_score >= -1.0 AS is_target_like
FROM scored ORDER BY doc_id
"""


def shard_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-order token-budget sharding via a two-phase distributed
    prefix sum (id-range bucket cumsum → exclusive bucket offsets →
    broadcast join). The oracle is the single-window global cumsum —
    semantically identical, but the Spark plan never funnels the corpus
    through one partition."""
    from gfe_db_spark.operators.packing import shard_by_token_budget as impl

    docs = table(spark, sf_dir, "documents")
    return impl(docs, budget=2048, bucket_span=64)


SHARD_BY_TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS start_offset,
       CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) / 2048) AS BIGINT) AS shard
FROM t ORDER BY doc_id
"""


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-gram
    shingles that appear in NO other document — the diversity/curation
    metric next to contamination (benchmark overlap) and TF-IDF
    (term salience). One shingle-keyed df agg, one join back, one
    doc-keyed rollup — all map-side combinable; never all-pairs."""
    from gfe_db_spark.operators import dedup as DD

    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    # df as a COUNT window over the shingle rows instead of agg + join
    # back (the same shape ngram_jaccard_pairs uses for sizes): the
    # agg+join form consumed the shingle frame twice, and once shingles()
    # stopped ending in a distinct() exchange (r13 — per-doc dedup moved
    # into the shingle array) the two branches re-ran the scan+explode
    # subtree and paid three pair-sized exchanges between them. The window
    # form scans once and shuffles the pairs once (plus the tiny per-doc
    # rollup exchange). df counts distinct (doc, shingle) rows, identical
    # to the joined agg.
    sh = DD.shingles(docs, n=3)
    return (
        sh.withColumn("df_", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("df_") == 1, 1)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 9).alias("novelty"),
        )
    )


TEXT_NGRAM_NOVELTY_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM t
  )
), df_ AS (
  SELECT shingle, COUNT(*) AS df_ FROM sh GROUP BY 1
)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) FILTER (WHERE df_.df_ = 1) AS BIGINT) AS n_novel,
       round(COUNT(*) FILTER (WHERE df_.df_ = 1) / COUNT(*), 9) AS novelty
FROM sh JOIN df_ USING (shingle)
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


def logreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (3 gradient steps, lr=0.5) fitting
    lang=='en' from two length features — the quality-classifier training
    loop of a data pipeline, run as DataFrame aggregations. The oracle
    unrolls the same three steps as nested SQL CTEs (the PageRank-oracle
    technique); fast-sigmoid + decimal-routed sums make the float loop
    bit-reproducible in both engines."""
    from gfe_db_spark.operators.ml import logreg_fit_summary

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        (F.length("text").cast("double") / F.lit(500.0)).alias("x1"),
        (
            F.size(F.filter(TX.tokenize(F.col("text")), lambda t: t != "")).cast(
                "double"
            )
            / F.lit(100.0)
        ).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    return logreg_fit_summary(feats, ["x1", "x2"], "y", steps=3, lr=0.5)


def _logreg_unrolled_sql(steps: int = 3, lr: float = 0.5) -> str:
    """Unrolled gradient-descent oracle: one (g, w) CTE pair per step."""
    z = "((w0 + w1*x1) + w2*x2)"
    p = f"(0.5 + {z} / (2.0 * (1.0 + abs({z}))))"

    def dsum(expr: str) -> str:
        return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)"

    ctes = [
        r"""f AS (
  SELECT CAST(length(text) AS DOUBLE) / 500.0 AS x1,
         CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
              AS DOUBLE) / 100.0 AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)""",
        "ws0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)",
    ]
    for s in range(1, steps + 1):
        ctes.append(
            f"""g{s} AS (
  SELECT COUNT(*) AS n,
         {dsum(f"({p} - y)")} AS g0,
         {dsum(f"({p} - y) * x1")} AS g1,
         {dsum(f"({p} - y) * x2")} AS g2
  FROM f, ws{s - 1}
)"""
        )
        ctes.append(
            f"""ws{s} AS (
  SELECT w0 - {lr} * (g0 / CAST(n AS DOUBLE)) AS w0,
         w1 - {lr} * (g1 / CAST(n AS DOUBLE)) AS w1,
         w2 - {lr} * (g2 / CAST(n AS DOUBLE)) AS w2
  FROM g{s}, ws{s - 1}
)"""
        )
    ctes.append(
        f"""fin AS (
  SELECT COUNT(*) AS n,
         COUNT(*) FILTER (WHERE ({z} > 0) = (y = 1.0)) AS n_correct
  FROM f, ws{steps}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT n, round(w0, 9) AS w0, round(w1, 9) AS w1, round(w2, 9) AS w2,
       round(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE), 9) AS accuracy
FROM fin, ws{steps}
"""
    )


LOGREG_TRAIN_SQL = _logreg_unrolled_sql(steps=3, lr=0.5)


def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet preprocessing): lines seen in
    ≥2 distinct document TEXTS are stripped, survivors reassembled in
    order. The frequency is digest-gated (r9): counting a line once per
    distinct text makes the boilerplate verdict invariant under exact
    duplication — on the raw-doc df, a 100-way-replicated corpus calls
    EVERY line boilerplate and strips itself empty (exact dups are the
    dedup stage's job, not a boilerplate signal). The removal semantics
    are covered by the planted multi-line tests in
    tests/test_operators.py."""
    docs = table(spark, sf_dir, "documents")
    return TX.strip_boilerplate(docs, min_docs=2, distinct_texts=True)


TEXT_BOILERPLATE_SQL = """
WITH lines AS (
  SELECT doc_id, dg, generate_subscripts(l, 1) AS pos, unnest(l) AS line
  FROM (SELECT doc_id, md5(text) AS dg, string_split(text, chr(10)) AS l
        FROM documents)
),
boiler AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT dg) >= 2
)
SELECT l.doc_id,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE b.line IS NULL) AS n_kept,
       COALESCE(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                           chr(10) ORDER BY l.pos), '') AS cleaned
FROM lines l LEFT JOIN boiler b USING (line)
GROUP BY l.doc_id
ORDER BY l.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "text_boilerplate_strip": QuerySpec(
        text_boilerplate_strip,
        TEXT_BOILERPLATE_SQL,
        "CCNet line-level boilerplate removal with ordered reassembly",
    ),
    "shard_by_token_budget": QuerySpec(
        shard_by_token_budget,
        SHARD_BY_TOKEN_BUDGET_SQL,
        "global token-budget sharding via two-phase distributed prefix sum",
    ),
    "text_ngram_novelty": QuerySpec(
        text_ngram_novelty,
        TEXT_NGRAM_NOVELTY_SQL,
        "per-doc novelty: share of 3-gram shingles unique to the document",
    ),
    "logreg_quality_train": QuerySpec(
        logreg_quality_train,
        LOGREG_TRAIN_SQL,
        "distributed logistic regression, hash-checked vs unrolled-GD SQL oracle",
    ),
    "weighted_sample_priority": QuerySpec(
        weighted_sample_priority,
        WEIGHTED_SAMPLE_SQL,
        "deterministic weighted sampling (priority sampling, no floats in selection)",
    ),
    "dsir_importance_weights": QuerySpec(
        dsir_importance_weights,
        DSIR_SQL,
        "DSIR-style unigram log-likelihood-ratio importance weights",
    ),
    "text_token_stats": QuerySpec(text_token_stats, TEXT_TOKEN_SQL, "token counting"),
    "text_quality_scores": QuerySpec(text_quality_scores, TEXT_QUALITY_SQL, "quality signals"),
    "domain_cap_sample": QuerySpec(
        domain_cap_sample, DOMAIN_CAP_SQL, "per-domain quality-ranked cap (C4-style balancing)"
    ),
    "text_lang_id": QuerySpec(text_lang_id, TEXT_LANG_SQL, "language-ID heuristic"),
    "text_fingerprint": QuerySpec(text_fingerprint, TEXT_FINGERPRINT_SQL, "doc fingerprint"),
    "text_split_assign": QuerySpec(
        text_split_assign, TEXT_SPLIT_SQL, "deterministic train/val/test split"
    ),
    "text_vocab_top": QuerySpec(text_vocab_top, TEXT_VOCAB_SQL, "top-k vocabulary build"),
    "text_tfidf_top_terms": QuerySpec(
        text_tfidf_top_terms, TEXT_TFIDF_SQL, "per-doc TF-IDF top terms"
    ),
    "corpus_sample": QuerySpec(
        corpus_sample, CORPUS_SAMPLE_SQL, "deterministic hash-gated subsample"
    ),
    "text_redact_pii": QuerySpec(
        text_redact_pii, TEXT_REDACT_SQL, "PII scrub with audit counts"
    ),
    "text_bigram_lm": QuerySpec(
        text_bigram_lm, TEXT_BIGRAM_SQL, "bigram LM top next-tokens"
    ),
    "doc_chunk_overlap": QuerySpec(
        doc_chunk_overlap, DOC_CHUNK_SQL, "overlapping context-window chunking"
    ),
    "mixture_resample": QuerySpec(
        mixture_resample, MIXTURE_RESAMPLE_SQL, "data-sized domain mixture rebalance"
    ),
    "text_repetition_stats": QuerySpec(
        text_repetition_stats, TEXT_REPETITION_SQL, "intra-doc repetition signals"
    ),
    "stratified_sample": QuerySpec(
        stratified_sample, STRATIFIED_SAMPLE_SQL, "per-stratum deterministic sampling"
    ),
    "fixed_k_per_group_sample": QuerySpec(
        fixed_k_per_group_sample,
        FIXED_K_SAMPLE_SQL,
        "exactly-k-per-stratum deterministic sample (hash-ranked window)",
    ),
    "pack_sequences": QuerySpec(
        pack_sequences, PACK_SEQUENCES_SQL, "sharded concat-and-chunk packing"
    ),
    "text_lm_score": QuerySpec(
        text_lm_score, TEXT_LM_SCORE_SQL, "bigram-LM cross-entropy quality score"
    ),
    "quality_decile_stats": QuerySpec(
        quality_decile_stats, QUALITY_DECILE_SQL, "per-language NTILE binning stats"
    ),
}
