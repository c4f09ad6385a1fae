"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All built-in-function compositions (JVM-side, codegen'd) — no Python in
the hot path, so these run at scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (n-gram heuristic substrate).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
}


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(text, "\\s+")


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex: words, numbers, and single
    punctuation marks each count as one token."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("long")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = tokenize(F.col(text_col))
    return docs.withColumn("n_tokens", F.size(toks).cast("long")).withColumn(
        "n_tokens_bpe", bpe_ish_token_count(F.col(text_col))
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios — the standard
    cheap quality signals."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    n_stop = F.size(F.array_intersect(toks, stop))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return docs.select(
        "*",
        F.length(t).cast("long").alias("n_chars_m"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_punct / F.greatest(F.length(t), F.lit(1)), 9).alias("punct_ratio"),
        F.round(n_upper / F.greatest(F.length(t), F.lit(1)), 9).alias("upper_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 9).alias("stopword_ratio"),
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts over the
    token set, argmax → predicted language ('und' when no marker hits)."""
    toks = tokenize(F.col(text_col))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score_cols.append(
            F.struct(
                F.size(F.array_intersect(toks, marker_arr)).cast("long").alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*score_cols))
    out = docs.withColumn("__best", best)
    return out.select(
        "*",
        F.when(F.col("__best.score") > 0, F.col("__best.lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        F.col("__best.score").alias("lang_score"),
    ).drop("__best")


def deterministic_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    train: int = 8000,
    val: int = 9000,
) -> DataFrame:
    """Reproducible train/val/test assignment: bucket = a 32-bit hash of
    (id, salt) mod 10000; bucket < `train` → train, < `val` → val, else
    test. Hash-based (not random) so the split is stable across runs,
    machines, and engines — the training-data-pipeline requirement.

    The 32-bit value is the little-endian first 4 bytes of md5, built from
    swapped hex pairs so any SQL engine with md5 can reproduce it
    (DuckDB: md5_number_upper(key) & 0xFFFFFFFF). Narrow map — no shuffle.
    """
    bucket = hash_bucket_10k(id_col, salt)
    return docs.withColumn(
        "split",
        F.when(bucket < train, "train").when(bucket < val, "val").otherwise("test"),
    )


def hash_le32(id_col: str, salt: str) -> Column:
    """Deterministic 32-bit hash: little-endian first 4 bytes of
    md5(id:salt), built from swapped hex pairs so any SQL engine with md5
    reproduces it (DuckDB: md5_number_upper(key) & 4294967295)."""
    return hash_le32_expr(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))


def hash_le32_expr(key: Column) -> Column:
    """hash_le32 over an arbitrary string-key expression (the caller builds
    the salted key). Same cross-engine contract: little-endian first 4
    bytes of md5(key) = DuckDB ``md5_number_upper(key) & 4294967295``."""
    h = F.md5(key)
    return F.conv(
        F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ),
        16, 10,
    ).cast("long")


def hash_bucket_10k(id_col: str, salt: str) -> Column:
    """Deterministic per-row bucket in [0, 10000): little-endian first 4
    bytes of md5(id:salt), mod 10000 (see deterministic_split for the
    portability rationale)."""
    return hash_le32(id_col, salt) % 10000


def deterministic_sample(
    docs: DataFrame,
    rate_bp: int = 1000,
    id_col: str = "doc_id",
    salt: str = "smp",
) -> DataFrame:
    """Deterministic corpus subsample: keep rows whose hash bucket falls
    below `rate_bp` basis points (1000 → 10%). Unlike df.sample(), the
    kept set is a pure function of (id, salt): re-runs, retries, and other
    engines select the same rows, and the filter is a narrow map that
    composes with predicate pushdown upstream."""
    return docs.filter(hash_bucket_10k(id_col, salt) < rate_bp)


def vocab_top_tokens(docs: DataFrame, text_col: str = "text", k: int = 200) -> DataFrame:
    """Vocabulary build: whitespace tokens ranked by corpus frequency,
    deterministic tie-break on the token itself. The classic word-count
    shape — explode fans out, partial aggregation combines map-side, the
    shuffle carries one row per distinct token per partition."""
    toks = tokenize(F.col(text_col))
    return (
        docs.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(k)
    )


# PII patterns: RE2-safe (no backtracking pathology), shared verbatim with
# the SQL oracle so redaction is engine-portable.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "url": r"https?://[^\s]+",
}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: emails, phone-like numbers, and
    URLs replaced with typed sentinels, with per-kind hit counts emitted
    alongside (the audit trail a compliance pass needs). Pure builtin
    regexp ops — narrow map at scan speed, no Python."""
    t = F.col(text_col)
    out = docs
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        )
    red = t
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.withColumn("text_redacted", red)


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (smooth idf: ln((N+1)/(df+1))+1).

    The inverted-index build shape at scale: explode → (doc, term) counts
    with map-side partial agg; document frequency is a COUNT window keyed
    by term over those already-deduped (doc, term) rows — one extra
    shuffle of the pairs, no self-join, and the expensive scan+explode
    subtree is evaluated exactly once (the agg+join form evaluated it
    twice: Catalyst reuses identical exchanges, not identical logical
    subtrees feeding differently-partitioned consumers). N is a 1-row
    broadcast. Ranking is a window keyed by doc (never global). Scores
    round to 9 before ranking so ordering is engine-portable; ties break
    on the term."""
    from pyspark.sql.window import Window as W

    from gfe_db_spark.operators import spread_small_input

    toks = tokenize(F.col(text_col))
    pairs = (
        spread_small_input(docs, key=id_col)
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        pairs.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 9
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rn").cast("int").alias("rank"))
    )


def bigram_next_tokens(
    docs: DataFrame, text_col: str = "text", k: int = 3, min_count: int = 2
) -> DataFrame:
    """Bigram LM counts: for each token, its top-k next tokens by corpus
    frequency (the n-gram language-model build). Word-count shape twice
    over: explode adjacent pairs (via the shingle machinery with n=2,
    multiplicity kept — LM counts need it), keyed agg with map-side
    partials, then a window keyed by the first token — never global."""
    from pyspark.sql.window import Window as W

    from gfe_db_spark.operators.dedup import shingles

    pairs = (
        shingles(docs, n=2, text_col=text_col, distinct=False)
        .select(F.split("shingle", " ").alias("bg"))
        .filter((F.size("bg") == 2) & (F.col("bg")[0] != "") & (F.col("bg")[1] != ""))
        .select(F.col("bg")[0].alias("w1"), F.col("bg")[1].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    w = W.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("w1", "w2", "n", "rank")
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct_texts: bool = False,
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: drop every line that
    appears verbatim in ``min_docs`` or more distinct documents (cookie
    banners, nav bars, license footers), reassemble the survivors in
    original order.

    ``distinct_texts=True`` computes the line frequency over DISTINCT
    document TEXTS instead of raw docs — the digest-gate insight applied
    to the df signal: on a corpus with k exact copies of every document
    (the replicated-crawl case), the raw-doc df calls every line of every
    duplicated doc "boilerplate" (each appears in k >= min_docs docs) and
    the pipeline strips the whole corpus empty (the r9 sf10 probe:
    corpus_prep_pipeline_v3 returned 0 rows on the 100-way-duplicated
    slice). Counting a line once per distinct text makes the boilerplate
    verdict duplication-invariant: exact dups belong to the dedup stage,
    not the boilerplate stage.

    Shape at scale: one keyed agg computes per-line document frequency
    (map-side combinable — under the distinct-texts gate the partial
    aggregation collapses (line, digest) duplicates before the shuffle),
    the corpus then LEFT-joins only against the *boilerplate* subset —
    lines over the threshold — which is orders of magnitude smaller than
    the line table and typically broadcastable; the hottest lines
    (highest df) are exactly the ones in the dim side, so the big side
    never self-joins and skew stays on the small side. Reassembly is a
    per-doc agg: collect (pos, line) structs for kept lines, array_sort
    (struct ordering sorts by pos first), join with the newline back.
    """
    freq_key = (
        F.md5(F.col(text_col)) if distinct_texts else F.col(id_col)
    ).alias("__freq_key")
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        freq_key,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("__freq_key").alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
        .select("line", F.lit(1).alias("__boiler"))
    )
    flagged = lines.join(F.broadcast(boiler), "line", "left")
    kept_struct = F.when(
        F.col("__boiler").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(kept_struct).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                "\n",
            ).alias("cleaned"),
        )
    )


def repetition_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition signals (the Gopher-style quality rules
    for machine-generated/looping text): duplicate-token fraction and the
    share of all bigrams taken by the single most frequent bigram.

    Shape at scale: the token stats are a narrow map (array builtins, no
    explode); only the bigram mode needs an explode + two keyed aggs, all
    map-side combinable and keyed by doc — no global shuffle hotspots.

    The doc_id-keyed spread (r13) does double duty: it parallelizes the
    heavy per-row array work (tokenize + array_distinct + zip_with
    bigrams previously ran on the compact scan's 1-3 splits — the entry's
    wall EQUALLED its single-thread CPU, guide §2.5 input skew), and its
    hash(doc_id) partitioning is a subset of both aggregates' group keys,
    so NEITHER agg needs its own exchange — one shuffle of compact texts
    replaces two shuffles of exploded bigram rows (guide §2.4).
    """
    from gfe_db_spark.operators import spread_small_input

    docs = spread_small_input(docs, key=id_col)
    toks = F.filter(tokenize(F.col(text_col)), lambda t: t != "")
    base = docs.select(
        F.col(id_col),
        toks.alias("toks"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).filter(F.col("n_tokens") >= 1)  # empty docs have no repetition signal
    bigrams = base.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.explode(
            F.when(
                F.col("n_tokens") >= 2,
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.col("n_tokens") - 1),
                    F.slice(F.col("toks"), 2, F.col("n_tokens") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array(F.lit(None).cast("string")))
        ).alias("bigram"),
    )
    per_bigram = bigrams.groupBy(id_col, "n_tokens", "n_distinct", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_bigram.groupBy(id_col, "n_tokens", "n_distinct")
        .agg(F.max(F.when(F.col("bigram").isNotNull(), F.col("c"))).alias("top_bigram_n"))
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6
            ).alias("dup_token_frac"),
            F.round(
                F.col("top_bigram_n") / (F.col("n_tokens") - 1), 6
            ).alias("top_bigram_frac"),
        )
    )


# per-language keep rates in basis points: oversample scarce languages,
# downsample the head — the mixture-rebalancing knob of a corpus build
STRATA_RATES_BP = {"en": 1000, "zh": 2500, "es": 2500, "de": 2500, "fr": 2500}
STRATA_DEFAULT_BP = 5000


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int] | None = None,
    default_bp: int = STRATA_DEFAULT_BP,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps rows whose
    hash gate falls under its own rate. Same engine-portable gate as
    deterministic_sample, so re-runs/retries/other engines agree row for
    row; the rate lookup is a CASE expression, not a join — a narrow map
    over the scan."""
    rates = rates_bp if rates_bp is not None else STRATA_RATES_BP
    rate: Column = F.lit(default_bp)
    for stratum, bp in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return docs.filter(hash_bucket_10k(id_col, salt) < rate)


def lm_cross_entropy(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document bigram-LM cross-entropy (the CCNet-style LM quality
    filter, with the corpus itself as the model): avg over a doc's bigrams
    of -ln p(w2|w1), where p = corpus count(w1,w2) / count(w1,·). Fluent,
    typical text scores low; rare or shuffled token sequences score high.

    Shape at scale: bigram explode → two keyed count aggs build the model;
    scoring is a keyed equi-join of doc bigrams against model rows (the
    model is a token-keyed table, broadcastable when the vocabulary is
    small); per-doc mean is a map-side-combinable agg. No windows, no
    all-pairs. Docs with fewer than two tokens have no bigrams and drop
    out (no LM evidence either way)."""
    from gfe_db_spark.operators.dedup import shingles

    bg = (
        shingles(docs, n=2, text_col=text_col, id_col=id_col, distinct=False)
        .select(id_col, F.split("shingle", " ").alias("p"))
        .filter((F.size("p") == 2) & (F.col("p")[0] != "") & (F.col("p")[1] != ""))
        .select(id_col, F.col("p")[0].alias("w1"), F.col("p")[1].alias("w2"))
    )
    c_ab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = c_ab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    model = c_ab.join(c_a, "w1")
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c_a")) - F.log(F.col("c_ab"))), 6).alias(
                "avg_neg_logp"
            ),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document into fixed-size
    character windows with overlap (`chunk_chars` wide, advancing by
    `stride`), the standard pre-tokenization step of a training-data
    pipeline. Implemented as sequence→explode→substr — a narrow map plus
    one explode, no shuffle, no Python; chunk counts derive from integer
    arithmetic only (floor((len - chunk + stride - 1) / stride)) so every
    engine computes the identical chunk set. Short documents yield exactly
    one (possibly partial) chunk; trailing chunks are truncated, never
    padded."""
    n = F.length(F.col(text_col)).cast("long")
    extra = (
        F.when(n <= F.lit(chunk_chars), F.lit(0).cast("long"))
        .otherwise(
            F.floor((n - F.lit(chunk_chars) + F.lit(stride - 1)) / F.lit(stride)).cast(
                "long"
            )
        )
    )
    exploded = docs.withColumn("n_chunks", extra + 1).withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1))
    )
    start = (F.col("chunk_idx").cast("int") * F.lit(stride)) + 1
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        "n_chunks",
        F.col(text_col).substr(start, F.lit(chunk_chars)).alias("chunk_text"),
    ).withColumn("chunk_len", F.length("chunk_text").cast("long"))


# integer mixture weights per source bucket: the head sources get 6×, the
# tail 1× — the domain-rebalancing knob of a corpus build
MIXTURE_WEIGHTS: dict[str, int] = {f"src{i}": 6 for i in range(5)}
MIXTURE_DEFAULT_WEIGHT = 1


def mixture_resample(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    default_weight: int = MIXTURE_DEFAULT_WEIGHT,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample-only domain-mixture rebalancing: given integer target
    weights per domain, find the largest total corpus T whose target
    mixture fits inside every domain's actual count (T = min over domains
    of floor(count_d * W_total / w_d)), then keep floor(T * w_d / W_total)
    rows of each domain via the engine-portable hash gate. All sizing is
    integer arithmetic on exact counts, so re-runs and other engines pick
    the same rows.

    Plan shape at scale: one keyed count agg (tiny result), a 1-row min
    reduce, a broadcast of the per-domain rate table back onto the scan,
    then a narrow filter — the corpus itself is never shuffled."""
    w = weights if weights is not None else MIXTURE_WEIGHTS
    weight: Column = F.lit(default_weight)
    for dom, wt in sorted(w.items()):
        weight = F.when(F.col(domain_col) == dom, F.lit(wt)).otherwise(weight)

    counts = (
        docs.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("weight", weight)
    )
    # W_total must cover every observed domain (known + default-weighted)
    wtot = counts.agg(F.sum("weight").alias("w_total"))
    sized = counts.crossJoin(F.broadcast(wtot)).withColumn(
        "capacity", F.floor(F.col("n_docs") * F.col("w_total") / F.col("weight"))
    )
    t_total = sized.agg(F.min("capacity").alias("t_total"))
    rates = (
        sized.crossJoin(F.broadcast(t_total))
        .withColumn("n_keep", F.floor(F.col("t_total") * F.col("weight") / F.col("w_total")))
        .withColumn("rate_bp", F.floor(F.col("n_keep") * 10000 / F.col("n_docs")))
        .select(domain_col, "weight", "n_docs", "rate_bp")
    )
    kept = (
        docs.join(F.broadcast(rates), domain_col)
        .filter(hash_bucket_10k(id_col, salt) < F.col("rate_bp"))
    )
    return kept


def fingerprint(
    docs: DataFrame, text_col: str = "text", k: int = 4, id_col: str | None = None
) -> DataFrame:
    """Document fingerprint: minimum digest over k-word rolling windows
    (winnowing-style selection with w = document). Identical up-to-window
    reorderings collide — by design for near-dup bucketing."""
    # ~T md5 calls per doc — spread a compact input first or the whole
    # fan-out runs on the input's few scan splits (r7 sf1 split: 50 s
    # wall on a one-file corpus with 31 idle cores). Pass `id_col` (a
    # unique id) to spread by hash instead of round-robin: keyless
    # repartition pays a local sort of the full payload rows
    # (sortBeforeRepartition, guide §2.5); hashing a UNIQUE id is
    # deterministic under retries with no sort. Hashing the TEXT column
    # would be wrong here — mass-duplicated texts would pile into one
    # partition — so the keyless form stays the default for callers
    # without an id.
    from gfe_db_spark.operators import spread_small_input

    docs = spread_small_input(docs, key=id_col)
    # Project the token array before the window transform: Catalyst does
    # not subexpression-eliminate a tokenize() referenced inside the
    # lambda, so the inline form re-ran the regex split once PER WINDOW
    # INDEX — O(tokens²) per doc (same fix as operators/dedup.shingles).
    tk = F.col("__fp_toks")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tk) - F.lit(k)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i + 1, k))),
    )
    return (
        docs.withColumn("__fp_toks", tokenize(F.col(text_col)))
        .withColumn(
            "fingerprint",
            F.when(F.size(tk) >= k, F.array_min(windows)).otherwise(F.lit(None)),
        )
        .drop("__fp_toks")
    )


def priority_sample(
    docs: DataFrame,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 100,
    salt: str = "wps",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield-Lund-Thorup): priority = w / u with u a
    hash-derived uniform, keep the k largest. Inclusion probability is
    proportional to weight, yet the sample is a pure function of
    (id, salt) — re-runs, retries, and other engines pick the same rows.

    Float discipline: u is an exact 32-bit integer, w an integer column;
    one IEEE division (correctly rounded on every engine) produces the
    priority, so the ranking is bit-identical cross-engine — no
    transcendentals. At scale the top-k is a per-partition heap merge
    (TakeOrderedAndProject), never a global sort."""
    u = hash_le32(id_col, salt) + F.lit(1)  # [1, 2^32] — exact as double
    return (
        docs.select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            (F.col(weight_col).cast("double") / u.cast("double")).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(k)
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, hashed-ngram
    variant): score each document by the mean log-likelihood ratio of its
    unigrams under the target domain vs the full corpus, with add-1
    smoothing. Positive score → looks like the target domain; used as the
    resampling weight for domain up-sampling.

    Plan shape: explode → two vocab-sized keyed aggs (target counts and
    corpus counts — map-side partials, result is |vocab| rows, which AQE
    broadcasts for the final join) → per-doc mean. The corpus is scanned
    once per count table and once for scoring; nothing driver-side.
    Scores round to 6 before the keep flag so the threshold compare is
    engine-portable."""
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("is_target"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    corpus_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("sc"))
    target_counts = (
        toks.filter(F.col("is_target"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    stats = corpus_counts.join(target_counts, "tok", "left").select(
        "tok", "sc", F.coalesce("tc", F.lit(0)).alias("tc")
    )
    scored = (
        toks.join(stats, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(
                F.avg(F.log((F.col("tc") + 1) / (F.col("sc") + 1))), 6
            ).alias("dsir_score"),
        )
    )
    return scored.withColumn("is_target_like", F.col("dsir_score") >= -1.0)
