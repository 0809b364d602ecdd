"""Content-filtering operators for training-data curation: PII
detection/redaction, repetition signals, cross-source contamination,
frequency-rank scoring.

The synthetic corpus contains no real PII, so the PII queries plant
deterministic emails/phones into a known subset (doc_id % 10 == 0) —
the operator must find exactly those (and the redaction round-trip
must remove them).  All regex/count logic is JVM column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sayn_spark.functions.registry import T, persist_tracked, register

# Width guard for compute-heavy scans (r14 optimization round): the
# documents/embeddings parquet at the test scale factors is a single
# row group, so every per-row fold/explode chained straight onto the
# scan ran SERIAL on a 32-core box (profiled: the DSIR feature
# extraction spent 3.5 s in ONE task before its first exchange).
# _fan_out repartitions to cluster width ONLY when the file is too
# small to split wide enough — at 100 TB splits >> cores and it is a
# no-op, so no plan changes at scale.
from sayn_spark.functions.dedup import _fan_out

# Bounded quantifiers, deliberately (hazard review r14 second pass,
# measured): the old unbounded `[a-z0-9._]+@` made Java's backtracking
# engine consume the REST of the document at every start position of a
# long alnum run and then fail at the '@' — O(len^2), 60s+ of pegged
# CPU on a single 500 KB digit document (jstack-confirmed in
# java.util.regex), per regexp call, per row.  RFC 5321 bounds the
# email local part at 64 chars and the domain at 255, so the bounded
# pattern matches every real email identically while capping the
# per-position backtrack at the bound (linear scan overall).  The
# oracle SQL embeds the same constant (DuckDB's RE2 is linear either
# way), so both engines stay textually in sync.
_EMAIL_RE = "[a-z0-9._]{1,64}@[a-z0-9.-]{1,255}\\.[a-z]{2,24}"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"

# planted PII: every 10th doc gets an email + phone appended
_SPARK_PII_CORPUS = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact user" +
    "' || cast(doc_id as string) || '@example.com or +1-555-0100' ELSE text END"
)
_SQL_PII_CORPUS = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or +1-555-0100' ELSE text END"
)


@register(
    "q_pii_scan",
    oracle=f"""
WITH corpus AS (SELECT doc_id, {_SQL_PII_CORPUS} AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
       len(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_len
FROM corpus
WHERE len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
   OR len(regexp_extract_all(text, '{_PHONE_RE}')) > 0
""",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: regex scan for emails/phones, length
    after redaction.  Must surface exactly the planted doc_id % 10 == 0
    subset.  Pure map-side work — scales linearly."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPARK_PII_CORPUS).alias("text")
    )
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return (
        d.select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            F.length(redacted).alias("redacted_len"),
        )
        .where((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
    )


def repetition_tokens_col(text_col: str = "text"):
    """Lowercased whitespace token array — the shared input of the
    repetition signals (and of the filter task's repetition scorer)."""
    return F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')")


def immediate_repeats_col(t: str = "t"):
    """Count of adjacent equal-token positions in the array column
    ``t`` (0 for arrays shorter than 2 — guarded explicitly: slice
    with a negative length would otherwise throw on empty arrays)."""
    return F.expr(
        f"case when size({t}) < 2 then 0 else "
        f"size(filter(zip_with(slice({t}, 1, size({t}) - 1), "
        f"slice({t}, 2, size({t}) - 1), (a, b) -> a = b), x -> x)) end"
    )


def repetition_ratio_col(t: str = "t"):
    """1 - distinct/total over the array column ``t`` (NULL for empty
    arrays — no tokens means no signal).

    ``try_divide``, not ``/``: under ANSI (Spark 4 default) a plain
    division by zero THROWS, so one zero-token document (an empty
    string is enough) killed the whole filter stage before the
    caller's coalesce-to-0.0 ever saw a row (hazard review r14 second
    pass, reproduced through the filter task's repetition scorer —
    the registered query never hit it because it filters
    ``size(t) >= 2`` first)."""
    return F.round(
        F.lit(1.0)
        - F.expr(f"try_divide(cast(size(array_distinct({t})) as double), size({t}))"),
        6,
    )


@register(
    "q_repetition_signals",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_filter(list_transform(generate_series(1, len(t) - 1),
                                      i -> t[i] = t[i+1]), x -> x)) AS n_immediate_repeats,
       ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS repetition_ratio
FROM tok WHERE len(t) >= 2
""",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals: immediate token repeats + overall
    repetition ratio (1 - distinct/total) — the cheap degenerate-text
    detectors run before expensive dedup.  The column builders are
    shared with the filter task's ``scorer: repetition``
    (operators/filter.py), so the task decision carries this query's
    oracle evidence."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", repetition_tokens_col().alias("t")).where(
        F.expr("size(t) >= 2")
    )
    return toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        immediate_repeats_col().alias("n_immediate_repeats"),
        repetition_ratio_col().alias("repetition_ratio"),
    )


@register(
    "q_contamination",
    oracle="""
WITH fp AS (
  SELECT doc_id, source,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' ')) AS fingerprint
  FROM documents
  UNION ALL
  SELECT doc_id + 100000, 'heldout',
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' '))
  FROM documents WHERE doc_id % 7 = 0
)
SELECT fingerprint,
       COUNT(DISTINCT source) AS n_sources,
       MIN(doc_id) AS example_doc
FROM fp
GROUP BY fingerprint
HAVING COUNT(DISTINCT source) > 1
""",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: identical content fingerprints that
    appear in more than one source (a planted 'heldout' split shares
    every 7th doc — train/test leakage detection at corpus scale)."""
    d = T(spark, sf_dir, "documents")
    fp = F.md5(
        F.expr(
            "concat_ws(' ', array_sort(array_distinct(filter(split(lower(text), ' '), x -> x != ''))))"
        )
    )
    base = d.select("doc_id", "source", fp.alias("fingerprint"))
    heldout = (
        d.where(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.lit("heldout").alias("source"),
            fp.alias("fingerprint"),
        )
    )
    return (
        base.unionByName(heldout)
        .groupBy("fingerprint")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("example_doc"),
        )
        .where(F.col("n_sources") > 1)
    )


@register(
    "q_token_rank_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
  FROM toks GROUP BY tok
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(v.rank) AS BIGINT) AS rank_sum,
       ROUND(CAST(SUM(v.rank) AS DOUBLE) / COUNT(*), 6) AS avg_rank
FROM toks t JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
""",
)
def q_token_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-rank scoring (perplexity proxy without a model): build
    the corpus vocabulary ranked by frequency, score each document by
    its tokens' average rank.  Vocab is tiny -> broadcast join; the
    scoring pass is linear."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.expr("filter(split(lower(text), ' '), x -> x != '')")).alias("tok")
    )
    w = Window.orderBy(F.desc("cnt"), "tok")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .select("tok", "rank")
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("rank").alias("rank_sum"),
            F.round(F.sum("rank").cast("double") / F.count(F.lit(1)), 6).alias("avg_rank"),
        )
    )


@register(
    "q_weighted_mixture",
    oracle="""
WITH rated AS (
  SELECT doc_id, source,
         (1 + (('0x' || substr(md5(source), 1, 4))::BIGINT % 5)) / 10.0 AS rate,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000) AS bucket
  FROM documents
)
SELECT source,
       ROUND(MAX(rate), 1) AS target_rate,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (bucket < rate * 1000) AS n_sampled
FROM rated GROUP BY source
""",
)
def q_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture construction: each source gets a deterministic
    sampling rate (derived from its name hash — stand-in for configured
    mixture weights) and rows are kept by content-hash bucket.  The
    standard way a 100 TB pretraining mix is drawn reproducibly."""
    d = T(spark, sf_dir, "documents")
    rate = (1 + F.expr("cast(conv(substr(md5(source), 1, 4), 16, 10) as bigint)") % 5) / 10.0
    bucket = F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)") % 1000
    rated = d.select("doc_id", "source", rate.alias("rate"), bucket.alias("bucket"))
    return rated.groupBy("source").agg(
        F.round(F.max("rate"), 1).alias("target_rate"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("bucket") < F.col("rate") * 1000).cast("long")).alias("n_sampled"),
    )


@register(
    "q_sequence_packing",
    oracle="""
WITH tok AS (
  SELECT doc_id, len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2048 AS BIGINT) AS bin_id
  FROM tok
)
SELECT bin_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY bin_id
""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: contiguous greedy fill of 2048-
    token context windows via a running token cumsum (bin = floor of
    the pre-document cumulative sum / window).  Exact integer window
    math — identical packing on any cluster size.

    At 100 TB the single global ordering becomes per-shard ordering
    (pack within partition) — same expression with a partitionBy."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.expr("size(filter(split(lower(text), ' '), x -> x != ''))").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = tok.select(
        "doc_id",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).cast("bigint").alias("bin_id"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


@register(
    "q_token_budget_mix",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
lang_stats AS (
  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM tok GROUP BY lang
),
globals AS (
  SELECT SUM(lang_tokens) AS tot, COUNT(*) AS n_langs FROM lang_stats
),
rated AS (
  SELECT ls.lang, ls.n_docs, ls.lang_tokens,
         CAST(LEAST(1000, ((g.tot // 2) * 1000) // (g.n_langs * ls.lang_tokens)) AS BIGINT) AS keep_per_mille
  FROM lang_stats ls CROSS JOIN globals g
)
SELECT r.lang, r.n_docs, r.lang_tokens, r.keep_per_mille,
       COUNT(*) FILTER (
         (('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000
           < r.keep_per_mille
       ) AS n_kept,
       COALESCE(SUM(t.n_tokens) FILTER (
         (('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000
           < r.keep_per_mille
       ), 0)::BIGINT AS tokens_kept
FROM rated r JOIN tok t ON t.lang = r.lang
GROUP BY r.lang, r.n_docs, r.lang_tokens, r.keep_per_mille
""",
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-solving mixture rebalance: downsample each language so the
    corpus fits a global token budget (here: half the corpus) split
    uniformly across languages — the two-pass \"solve rates from stats,
    then apply\" shape of real pretraining-mix construction.  Pass 1
    aggregates per-language token counts (tiny result, broadcast);
    pass 2 filters by content-hash per-mille bucket against the solved
    rate.  All rate math is integer (per-mille, div) so both engines
    agree exactly; rates cap at 1000 (never upsample).

    At 100 TB pass 1 is a cheap scan-aggregate and pass 2 is a
    map-side filter — no shuffle touches the documents themselves.
    """
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.expr("size(filter(split(lower(text), ' '), x -> x != ''))").alias("n_tokens"),
    )
    lang_stats = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("lang_tokens")
    )
    globals_ = lang_stats.agg(
        F.sum("lang_tokens").alias("tot"), F.count(F.lit(1)).alias("n_langs")
    )
    rated = lang_stats.join(F.broadcast(globals_)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.expr("least(1000, ((tot div 2) * 1000) div (n_langs * lang_tokens))").alias(
            "keep_per_mille"
        ),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 1000"
    )
    kept = F.col("bucket") < F.col("keep_per_mille")
    return (
        tok.select("doc_id", "lang", "n_tokens", bucket.alias("bucket"))
        .join(F.broadcast(rated), "lang")
        .groupBy("lang", "n_docs", "lang_tokens", "keep_per_mille")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)).alias(
                "tokens_kept"
            ),
        )
    )


_CHUNK_LEN = 32
_CHUNK_STRIDE = 24
_CHUNK_MOD = 1_000_000_007


@register(
    "q_doc_chunking",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 1),
chunks AS (
  SELECT doc_id, n,
         LEAST({_CHUNK_LEN}, n - s + 1) AS clen,
         ('0x' || substr(md5(array_to_string(
             list_slice(toks, s, s + {_CHUNK_LEN} - 1), ' ')), 1, 15))::BIGINT
           % {_CHUNK_MOD} AS chash
  FROM sized, UNNEST(generate_series(1, n, {_CHUNK_STRIDE})) AS u(s)
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_chunks, SUM(clen) AS doc_chunk_tokens,
         SUM(chash) AS doc_chash
  FROM chunks GROUP BY doc_id
)
SELECT n_chunks, COUNT(*) AS n_docs,
       CAST(SUM(doc_chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(SUM(doc_chash) AS BIGINT) AS chunk_checksum
FROM per_doc GROUP BY n_chunks
""",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (the complement of q_sequence_packing):
    split each document into {_CHUNK_LEN}-token windows with stride
    {_CHUNK_STRIDE} (8-token overlap), the standard long-document
    treatment before training/embedding.  Chunk starts come from an
    array-local sequence() explode — each document expands
    independently, so at 100 TB this is pure map-side flatMap with no
    shuffle until the final histogram; per-chunk md5 checksums (summed
    mod p) pin that both engines produced byte-identical chunk text.
    """
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("toks")
    ).where(F.size("toks") >= 1)
    ch = tok.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.col("toks"),
        F.explode(F.expr(f"sequence(1, size(toks), {_CHUNK_STRIDE})")).alias("s"),
    ).select(
        "doc_id",
        F.least(F.lit(_CHUNK_LEN), F.col("n") - F.col("s") + 1).alias("clen"),
        (
            F.conv(
                F.substring(
                    F.md5(F.expr(f"array_join(slice(toks, s, {_CHUNK_LEN}), ' ')")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _CHUNK_MOD
        ).alias("chash"),
    )
    per_doc = ch.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("clen").alias("doc_chunk_tokens"),
        F.sum("chash").alias("doc_chash"),
    )
    return per_doc.groupBy("n_chunks").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_chunk_tokens").alias("sum_chunk_tokens"),
        F.sum("doc_chash").alias("chunk_checksum"),
    )


# document quality score — the exact expression from functions/text.py's
# q_text_quality (kept textually in sync; both rounded to 6 so the two
# engines share one value space)
_Q_TOKENS = "filter(split(lower(text), ' '), x -> x != '')"
_Q_SQL_TOKENS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
_Q_SW = "('the','a','of','and','is')"
_QUALITY_SPARK = (
    f"round(0.4 * (cast(size(array_distinct({_Q_TOKENS})) as double) / size({_Q_TOKENS}))"
    f" + 0.3 * (1.0 - cast(size(filter({_Q_TOKENS}, x -> x in {_Q_SW})) as double) / size({_Q_TOKENS}))"
    f" + 0.3 * least(1.0, size({_Q_TOKENS}) / 100.0), 6)"
)
_QUALITY_SQL = (
    f"ROUND(0.4 * (CAST(len(list_distinct({_Q_SQL_TOKENS})) AS DOUBLE) / len({_Q_SQL_TOKENS}))"
    f" + 0.3 * (1.0 - CAST(len(list_filter({_Q_SQL_TOKENS}, x -> x IN {_Q_SW})) AS DOUBLE) / len({_Q_SQL_TOKENS}))"
    f" + 0.3 * LEAST(1.0, len({_Q_SQL_TOKENS}) / 100.0), 6)"
)


@register(
    "q_quality_adaptive_filter",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, CAST(ROUND({_QUALITY_SQL} * 1000000) AS BIGINT) AS qmicro
  FROM documents
),
ranked AS (
  SELECT source, qmicro,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY qmicro, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
),
thresholds AS (
  SELECT source,
         SUM(CASE WHEN rn = (n + 1) // 2 THEN qmicro ELSE 0 END)
       + SUM(CASE WHEN rn = (n + 2) // 2 THEN qmicro ELSE 0 END) AS thr2
  FROM ranked GROUP BY source
)
SELECT s.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN 2 * s.qmicro >= t.thr2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CASE WHEN 2 * s.qmicro >= t.thr2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS keep_rate,
       CAST(t.thr2 AS DOUBLE) / 2000000.0 AS median_quality
FROM scored s JOIN thresholds t ON t.source = s.source
GROUP BY s.source, t.thr2
""",
)
def q_quality_adaptive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-source quality filtering — each source keeps only
    documents at or above its OWN quality median, instead of one global
    threshold that over-prunes weak sources and under-prunes strong
    ones (the per-dump calibration step of web-corpus curation).

    The median is computed in integer micro-units to be boundary-free
    by construction (VERDICT r5 item 1): quality is already rounded to
    6dp, so ``qmicro = round(quality * 1e6)`` is an exact BIGINT in
    both engines, the even-count median is the exact integer sum of the
    two middle order statistics (``thr2``), and the keep decision
    ``2*qmicro >= thr2`` never touches floating point.  The old
    ``round(percentile(...), 6)`` formulation landed exactly on the
    6dp round-half boundary for 8 of 20 sources at sf0.1, making the
    oracle hash FP-version-dependent.  ``median_quality = thr2/2e6``
    is an exact-integer-to-double conversion followed by one IEEE
    division — bit-identical across engines.

    Scale shape: one pass to score (JVM expressions), one shuffle on
    source for the per-source rank (the order statistics), and a
    broadcast of the tiny per-source threshold table back onto the
    scored stream.  At 100 TB you swap the exact order statistics for
    ``percentile_approx`` micro-units and nothing else changes.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = d.select(
        "doc_id",
        "source",
        F.expr(f"cast(round(({_QUALITY_SPARK}) * 1000000) as bigint)").alias("qmicro"),
    )
    w = Window.partitionBy("source").orderBy("qmicro", "doc_id")
    ranked = scored.select(
        "source",
        "qmicro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    lo = F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("qmicro")).otherwise(F.lit(0))
    hi = F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("qmicro")).otherwise(F.lit(0))
    thresholds = ranked.groupBy("source").agg((F.sum(lo) + F.sum(hi)).alias("thr2"))
    joined = scored.join(F.broadcast(thresholds), "source")
    kept = F.when(F.lit(2) * F.col("qmicro") >= F.col("thr2"), 1).otherwise(0)
    return joined.groupBy("source", "thr2").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        F.round(F.sum(kept).cast("double") / F.count(F.lit(1)), 6).alias("keep_rate"),
    ).select(
        "source",
        "n_docs",
        "n_kept",
        "keep_rate",
        (F.col("thr2").cast("double") / F.lit(2000000.0)).alias("median_quality"),
    )


_NGRAM_TOKENS = "filter(split(lower(text), ' '), x -> x != '')"


def ngram_hash_frame(df: DataFrame, text_column: str, n: int, id_column: str | None):
    """Distinct (``id?``, h) xxhash64 keys of every n-token sequence —
    shared by q_decontaminate_ngrams and the decontaminate task."""
    work = df.where(F.col(text_column).isNotNull()).withColumn(
        "toks", F.expr(_NGRAM_TOKENS.replace("text", text_column))
    )
    grams = F.expr(
        f"case when size(toks) >= {n} then "
        f"transform(sequence(1, size(toks) - {n} + 1), "
        f"i -> concat_ws(' ', slice(toks, i, {n}))) "
        "else cast(array() as array<string>) end"
    )
    cols = ([F.col(id_column)] if id_column else []) + [
        F.explode(grams).alias("g")
    ]
    out = work.select(*cols).select(
        *( [id_column] if id_column else [] ), F.xxhash64("g").alias("h")
    )
    return out.distinct()


@register(
    "q_decontaminate_ngrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
src_g AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
         i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM toks WHERE len(t) >= 8
),
ev_raw AS (
  SELECT array_to_string(t[3:10], ' ') AS text
  FROM toks WHERE doc_id % 9 = 0 AND len(t) >= 10
),
ev_toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM ev_raw
),
ev_g AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 7),
         i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM ev_toks WHERE len(t) >= 8
)
SELECT DISTINCT doc_id AS contaminated_id FROM src_g
WHERE g IN (SELECT g FROM ev_g)
""",
)
def q_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (the 13-gram rule of
    the GPT-3 appendix, at n=8 for this corpus's document lengths):
    training documents sharing any 8-token sequence with a held-out
    eval set are contaminated.  The eval set is planted — 8-token
    snippets (token offset 3) of every 9th document — so the snippet
    donors are contaminated by construction, plus any natural overlap.

    Scale design (the engine task `type: decontaminate` is this exact
    plan over arbitrary tables): both sides reduce to 8-byte xxhash64
    n-gram keys, the eval side (benchmarks are MBs against a 100 TB
    corpus) broadcasts, and the check is a map-side LEFT SEMI join —
    the corpus never shuffles and text never leaves its partitions.
    Documents shorter than n tokens have no n-grams and are immune.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    ev = (
        d.where(F.col("doc_id") % 9 == 0)
        .select(
            F.expr(
                "concat_ws(' ', slice(filter(split(lower(text), ' '), x -> x != ''), 3, 8))"
            ).alias("text")
        )
        .where(F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 8)
    )
    ev_hashes = ngram_hash_frame(ev, "text", 8, None)
    src_hashes = ngram_hash_frame(d, "text", 8, "doc_id")
    return (
        src_hashes.join(F.broadcast(ev_hashes), "h", "left_semi")
        .select(F.col("doc_id").alias("contaminated_id"))
        .distinct()
    )


@register(
    "q_ngram_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
           i -> array_to_string(t[i:i+7], ' '))) AS g
    FROM toks WHERE len(t) >= 8)
),
first_owner AS (SELECT g, MIN(doc_id) AS owner FROM grams GROUP BY g)
SELECT gr.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.owner = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.owner = gr.doc_id THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
         AS BIGINT) AS novelty_ppm
FROM grams gr JOIN first_owner f USING (g)
GROUP BY gr.doc_id
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scan — for each document, the fraction of its
    distinct 8-gram hashes NOT already present in any lower-id
    document (ingest order): the memorization/freshness signal a
    training pipeline uses to prioritise new data over re-crawls and
    boilerplate (a re-crawled page scores ~0, a genuinely new page
    ~1e6 ppm).  Ownership is first-writer (min doc_id), so the metric
    is deterministic under any execution order.

    novelty_ppm is an exact integer FLOOR division (never a rounded
    double): n_grams can be a power of two, which puts
    round(n_novel/n_grams, 6) exactly on a round-half boundary — the
    FP-fragility class fixed in q_quality_adaptive_filter, avoided
    here by construction.

    Scale shape: documents reduce to distinct 8-byte xxhash64 gram
    keys (the decontaminate reduction); one shuffle on the hash for
    the min-owner aggregate (map-side combinable — hot boilerplate
    grams collapse before the exchange), one hash-key join back, and
    a map-side-combinable per-doc count.  Text never moves; at 100 TB
    the widest stream is the (h, doc_id) pair list, the same width
    the exact-dedup fingerprint pass already shuffles.

    Engine note: the Spark plan moves 8-byte xxhash64 keys; the oracle
    restates the same membership logic over the raw gram strings
    (exact truth), so the comparison also certifies that hashing
    introduced no collisions on this corpus.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    grams = ngram_hash_frame(d, "text", 8, "doc_id")
    first_owner = grams.groupBy("h").agg(F.min("doc_id").alias("owner"))
    novel = F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(first_owner, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_grams").alias("novelty_ppm"),
        )
    )


# --- Gopher-style rule filter (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A) -

_GOPHER_STOPS = ("the", "a", "of", "and", "is")


def gopher_signal_cols(t: str = "t") -> dict:
    """The five Gopher rule signals over a lowercased token-array
    column ``t`` — shared by q_quality_gopher_rules and the filter
    task's ``scorer: gopher`` (operators/filter.py), so the task
    decision carries the query's oracle evidence.  All counts are
    exact integers; every downstream rule is an integer
    cross-multiplication, so the gate is boundary-free by construction
    (the FP-fragility class fixed in q_quality_adaptive_filter never
    arises)."""
    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return {
        "n_words": F.size(F.expr(t)).cast("bigint"),
        "sum_word_chars": F.expr(
            f"aggregate({t}, cast(0 as bigint), (acc, x) -> acc + length(x))"
        ),
        "n_alpha_words": F.expr(
            f"cast(size(filter({t}, x -> x rlike '[a-z]')) as bigint)"
        ),
        "n_symbol_words": F.expr(
            f"cast(size(filter({t}, x -> instr(x, '#') > 0 "
            f"or instr(x, '...') > 0)) as bigint)"
        ),
        "n_stop_distinct": F.expr(
            f"cast(size(filter(array({stops}), s -> array_contains({t}, s))) "
            f"as bigint)"
        ),
    }


def gopher_pass_col(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_permille: int = 100,
    min_alpha_permille: int = 800,
    min_stop_words: int = 2,
):
    """Conjunction of the five Gopher rules as integer comparisons over
    the gopher_signal_cols outputs (columns must already be bound).
    Published defaults; mean-word-length bounds are integer characters
    and the two ratio rules are permille cross-multiplications —
    ``1000 * n_symbol_words <= max_symbol_permille * n_words`` never
    computes a float."""
    n, s = F.col("n_words"), F.col("sum_word_chars")
    return (
        (n >= F.lit(int(min_words)))
        & (n <= F.lit(int(max_words)))
        & (F.lit(int(min_mean_word_len)) * n <= s)
        & (s <= F.lit(int(max_mean_word_len)) * n)
        & (F.lit(1000) * F.col("n_symbol_words") <= F.lit(int(max_symbol_permille)) * n)
        & (F.lit(1000) * F.col("n_alpha_words") >= F.lit(int(min_alpha_permille)) * n)
        & (F.col("n_stop_distinct") >= F.lit(int(min_stop_words)))
    )


@register(
    "q_quality_gopher_rules",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS sum_word_chars,
         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
           AS n_alpha_words,
         CAST(len(list_filter(t, x -> strpos(x, '#') > 0 OR strpos(x, '...') > 0))
           AS BIGINT) AS n_symbol_words,
         CAST(len(list_filter(['the','a','of','and','is'],
                              s -> list_contains(t, s))) AS BIGINT) AS n_stop_distinct
  FROM tok WHERE len(t) >= 1
)
SELECT doc_id, n_words, sum_word_chars, n_alpha_words, n_symbol_words,
       n_stop_distinct,
       CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END
         AS pass_word_count,
       CASE WHEN 3 * n_words <= sum_word_chars
             AND sum_word_chars <= 10 * n_words THEN 1 ELSE 0 END
         AS pass_mean_word_len,
       CASE WHEN 1000 * n_symbol_words <= 100 * n_words THEN 1 ELSE 0 END
         AS pass_symbol_ratio,
       CASE WHEN 1000 * n_alpha_words >= 800 * n_words THEN 1 ELSE 0 END
         AS pass_alpha_ratio,
       CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END AS pass_stopwords,
       CASE WHEN n_words >= 50 AND n_words <= 100000
             AND 3 * n_words <= sum_word_chars
             AND sum_word_chars <= 10 * n_words
             AND 1000 * n_symbol_words <= 100 * n_words
             AND 1000 * n_alpha_words >= 800 * n_words
             AND n_stop_distinct >= 2 THEN 1 ELSE 0 END AS gopher_pass
FROM sig
""",
)
def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filtering (Rae et al. 2021, Appendix A): word
    count in [50, 100k], mean word length in [3, 10] characters,
    symbol-to-word ratio <= 0.1, >= 80% of words containing an
    alphabetic character, and >= 2 distinct stop words present — the
    published heuristic gate web-corpus pipelines run before any
    model-based scoring.

    Every rule is an integer cross-multiplication over exact token
    counts (``3 * n_words <= sum_word_chars`` instead of
    ``sum_word_chars / n_words >= 3.0``), so no rule ever computes or
    rounds a float: the gate is boundary-free by construction and the
    oracle comparison cannot be FP-version-dependent.

    Scale shape: pure map-side JVM column expressions over the text
    scan — no shuffle, no UDF, linear in corpus bytes; the filter
    composes with the scan's predicate pushdown.  The same builders
    power ``scorer: gopher`` in the filter task and the streaming
    front door (stateless predicate — append mode, no state store).
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q_TOKENS).alias("t")
    ).where(F.expr("size(t) >= 1"))
    sig = d.select("doc_id", *(c.alias(k) for k, c in gopher_signal_cols().items()))
    flags = {
        "pass_word_count": (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000),
        "pass_mean_word_len": (F.lit(3) * F.col("n_words") <= F.col("sum_word_chars"))
        & (F.col("sum_word_chars") <= F.lit(10) * F.col("n_words")),
        "pass_symbol_ratio": F.lit(1000) * F.col("n_symbol_words")
        <= F.lit(100) * F.col("n_words"),
        "pass_alpha_ratio": F.lit(1000) * F.col("n_alpha_words")
        >= F.lit(800) * F.col("n_words"),
        "pass_stopwords": F.col("n_stop_distinct") >= 2,
    }
    out = sig.select(
        "*", *(F.when(c, 1).otherwise(0).alias(k) for k, c in flags.items())
    )
    return out.withColumn("gopher_pass", gopher_pass_col().cast("int"))


def isqrt_sql(t: str) -> str:
    """Exact integer square root of a BIGINT expression, portable SQL
    (valid in both Spark SQL and DuckDB): floor of the double sqrt,
    then a +/-1 integer correction — the double rounding error near
    perfect squares never survives the adjustment, so the result is
    exact for any corpus-scale count (100 TB ~ 10^14 tokens)."""
    s0 = f"cast(floor(sqrt(cast(({t}) as double))) as bigint)"
    return (
        f"({s0} + (case when ({s0} + 1) * ({s0} + 1) <= ({t}) then 1 else 0 end)"
        f" - (case when {s0} * {s0} > ({t}) then 1 else 0 end))"
    )


@register(
    "q_mixture_temperature",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
stats AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS grp_tokens
  FROM tok GROUP BY source
),
weighted AS (
  SELECT source, n_docs, grp_tokens,
         {isqrt_sql('grp_tokens')} AS w_sqrt
  FROM stats
),
tot AS (
  SELECT CAST(SUM(grp_tokens) AS BIGINT) AS tot_tokens,
         CAST(SUM(w_sqrt) AS BIGINT) AS sum_w
  FROM weighted
),
rated AS (
  SELECT w.source, w.n_docs, w.grp_tokens, w.w_sqrt,
         LEAST(1000, ((t.tot_tokens // 2) * w.w_sqrt * 1000)
                     // (t.sum_w * w.grp_tokens)) AS rate_pm
  FROM weighted w CROSS JOIN tot t
)
SELECT r.source, r.n_docs, r.grp_tokens, r.w_sqrt, r.rate_pm,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000 < r.rate_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000 < r.rate_pm THEN k.n_tokens END), 0) AS BIGINT)
         AS tokens_kept
FROM tok k JOIN rated r USING (source)
GROUP BY r.source, r.n_docs, r.grp_tokens, r.w_sqrt, r.rate_pm
""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual-corpus
    rebalance of Lample & Conneau 2019 / mT5): each domain's sampling
    weight is ``tokens^alpha`` with alpha = 0.5, flattening the size
    distribution so head domains stop dominating while tail domains
    are not upsampled into repetition.  Half the corpus' tokens is the
    budget; each group g keeps ``budget * w_g / sum(w)`` tokens where
    ``w_g = isqrt(tokens_g)``.

    ``tokens^0.5`` is computed as an EXACT integer square root
    (isqrt_sql: floor-double-sqrt plus +/-1 integer correction), and
    the rate solve is pure integer floor division — no float is ever
    computed or rounded, so the oracle comparison is boundary-free by
    construction.  The keep decision reuses the md5 per-mille bucket of
    the other mixture queries (deterministic under any cluster layout).

    Scale shape: pass 1 scan-aggregate (tiny per-domain frame), rate
    solve on the driver-sized frame, pass 2 map-side filter — the
    document stream is never shuffled.  At 100 TB move the bigint
    products to DECIMAL(38,0) exactly as the mixture task does
    (operators/mixture.py) — tot * w * 1000 wraps int64 past ~10^13
    tokens.
    """
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.expr("size(filter(split(lower(text), ' '), x -> x != ''))").alias("n_tokens"),
    )
    stats = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("grp_tokens"),
    )
    weighted = stats.withColumn("w_sqrt", F.expr(isqrt_sql("grp_tokens")))
    tot = weighted.agg(
        F.sum("grp_tokens").cast("bigint").alias("tot_tokens"),
        F.sum("w_sqrt").cast("bigint").alias("sum_w"),
    )
    rated = weighted.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "grp_tokens",
        "w_sqrt",
        F.expr(
            "least(1000, ((tot_tokens div 2) * w_sqrt * 1000)"
            " div (sum_w * grp_tokens))"
        ).alias("rate_pm"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 1000"
    )
    kept = F.col("bucket") < F.col("rate_pm")
    return (
        tok.select("doc_id", "source", "n_tokens", bucket.alias("bucket"))
        .join(F.broadcast(rated), "source")
        .groupBy("source", "n_docs", "grp_tokens", "w_sqrt", "rate_pm")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )


@register(
    "q_repetition_top_ngram",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
base AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS sum_chars
  FROM tok WHERE len(t) >= 2
),
grams_raw AS (
  SELECT b.doc_id, gn.n,
         unnest(list_transform(generate_series(1, len(b.t) - gn.n + 1),
                i -> struct_pack(i := i,
                     g := array_to_string(b.t[i:i + gn.n - 1], ' ')))) AS u
  FROM base b
  CROSS JOIN (SELECT unnest([2, 3, 4, 5]) AS n) gn
  WHERE len(b.t) >= gn.n
),
grams AS (SELECT doc_id, n, u.i AS i, u.g AS g FROM grams_raw),
counts AS (
  SELECT doc_id, n, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, n, g
),
top AS (
  SELECT doc_id, n, cnt, CAST(len(g) - (n - 1) AS BIGINT) AS gram_chars
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, n ORDER BY cnt DESC, g) AS rk
    FROM counts
  ) WHERE rk = 1 AND n <= 4
),
dup5_pos AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT gr.doc_id, unnest(generate_series(gr.i, gr.i + 4)) AS pos
    FROM grams gr
    JOIN counts c ON c.doc_id = gr.doc_id AND c.n = 5 AND c.g = gr.g AND c.cnt >= 2
    WHERE gr.n = 5
  )
),
dup5 AS (
  SELECT d.doc_id, CAST(SUM(len(b.t[d.pos])) AS BIGINT) AS dup_chars
  FROM dup5_pos d JOIN base b ON b.doc_id = d.doc_id
  GROUP BY d.doc_id
)
SELECT b.doc_id, b.n_tokens, b.sum_chars,
       COALESCE(MAX(CASE WHEN tp.n = 2 THEN tp.cnt * tp.gram_chars * 1000000 // b.sum_chars END), 0) AS top2_ppm,
       COALESCE(MAX(CASE WHEN tp.n = 3 THEN tp.cnt * tp.gram_chars * 1000000 // b.sum_chars END), 0) AS top3_ppm,
       COALESCE(MAX(CASE WHEN tp.n = 4 THEN tp.cnt * tp.gram_chars * 1000000 // b.sum_chars END), 0) AS top4_ppm,
       COALESCE(MAX(d.dup_chars * 1000000 // b.sum_chars), 0) AS dup5_ppm
FROM base b
LEFT JOIN top tp ON tp.doc_id = b.doc_id
LEFT JOIN dup5 d ON d.doc_id = b.doc_id
GROUP BY b.doc_id, b.n_tokens, b.sum_chars
""",
)
def q_repetition_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText repetition signals (Rae et al. 2021, Table A2): the
    character fraction covered by the single most frequent {2,3,4}-gram
    and by ALL duplicated 5-grams (union of covered positions, so
    overlapping occurrences are not double-counted) — the degenerate-
    text detectors that catch boilerplate loops exact dedup misses.

    All fractions are integer ppm via floor division over exact
    character counts (gram chars = string length minus separator
    spaces), never a rounded float — boundary-free by construction.
    The published gate thresholds (0.20 / 0.18 / 0.16 for top-grams,
    0.15 for dup-5-grams) become integer comparisons against
    200000/180000/160000/150000 ppm downstream.

    Scale shape: one explode to (doc, n, position) gram rows — fan-out
    ~4x token count, slim strings — then per-(doc, n, gram) map-side-
    combinable counts, a per-doc top-1 window over the tiny per-doc
    gram-count frame, and a distinct-position union for the dup-5
    coverage.  Everything shuffles on doc_id-prefixed keys (no global
    state), so the pass scales linearly and partitions by document
    like the other text signals.
    """
    d = _fan_out(
        T(spark, sf_dir, "documents").select("doc_id", "text"), spark, sf_dir
    )
    return top_ngram_signal_frame(d)


def _top_run_expr(n: int) -> str:
    """Per-row top-``n``-gram (count, gram) via a fold over the doc's
    own SORTED gram list: runs of equal grams are contiguous, so one
    left-to-right pass tracks the longest run; strict ``>`` keeps the
    lexicographically smallest gram on count ties (the same order as
    ``ROW_NUMBER() OVER (ORDER BY cnt DESC, g)``)."""
    grams = (
        f"case when size(t) >= {n} then array_sort(transform("
        f"sequence(1, size(t) - {n} + 1), i -> array_join(slice(t, i, {n}), ' '))) "
        f"else cast(array() as array<string>) end"
    )
    run = "case when x <=> a.prev then a.run + 1 else cast(1 as bigint) end"
    return (
        f"aggregate({grams}, "
        "named_struct('prev', cast(null as string), 'run', cast(0 as bigint), "
        "'bestc', cast(0 as bigint), 'bestg', cast(null as string)), "
        f"(a, x) -> named_struct('prev', x, 'run', {run}, "
        f"'bestc', case when ({run}) > a.bestc then ({run}) else a.bestc end, "
        f"'bestg', case when ({run}) > a.bestc then x else a.bestg end), "
        "a -> named_struct('c', a.bestc, 'g', a.bestg))"
    )


_DUP5_STARTS_EXPR = """
aggregate(
  case when size(t) >= 5 then array_sort(transform(sequence(1, size(t) - 4),
      i -> named_struct('g', array_join(slice(t, i, 5), ' '), 'i', i)))
  else cast(array() as array<struct<g: string, i: int>>) end,
  named_struct('prev', cast(null as string),
               'starts', cast(array() as array<int>),
               'dups', cast(array() as array<int>)),
  (a, x) -> case when x.g <=> a.prev
    then named_struct('prev', x.g, 'starts', concat(a.starts, array(x.i)),
                      'dups', a.dups)
    else named_struct('prev', x.g, 'starts', array(x.i),
                      'dups', case when size(a.starts) >= 2
                              then concat(a.dups, a.starts) else a.dups end)
    end,
  a -> case when size(a.starts) >= 2 then concat(a.dups, a.starts) else a.dups end)
"""


def top_ngram_signal_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, sum_chars, top2_ppm, top3_ppm, top4_ppm,
    dup5_ppm) for a (doc_id, text) frame — the body of
    q_repetition_top_ngram, shared with the filter task's repetition
    scorer so its gate decisions carry that query's oracle evidence.
    Docs with fewer than 2 tokens are dropped (no signal).

    ZERO-shuffle by construction: every signal is per-document, so the
    whole computation folds over the doc's own token array with
    higher-order functions — sort the doc's gram list, run-length for
    the top gram, run-grouping for duplicated 5-gram starts, and a
    position-union char sum, all inside the row.  Nothing leaves the
    scan: no explode, no groupBy, no window — the pass is linear in
    corpus bytes at any scale (the oracle restates the same semantics
    relationally over exploded grams, certifying the fold)."""
    d = docs.select(
        "doc_id", F.expr(_NGRAM_TOKENS).alias("t")
    ).where(F.expr("size(t) >= 2"))
    base = d.select(
        "doc_id",
        "t",
        F.expr("cast(size(t) as bigint)").alias("n_tokens"),
        F.expr(
            "aggregate(t, cast(0 as bigint), (acc, x) -> acc + length(x))"
        ).alias("sum_chars"),
        *(F.expr(_top_run_expr(n)).alias(f"_top{n}") for n in (2, 3, 4)),
        F.expr(_DUP5_STARTS_EXPR).alias("_dupstarts"),
    )
    top_ppm = lambda n: F.expr(
        f"case when _top{n}.c > 0 then "
        f"(_top{n}.c * (length(_top{n}.g) - {n - 1}) * 1000000) div sum_chars "
        "else cast(0 as bigint) end"
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "sum_chars",
        top_ppm(2).alias("top2_ppm"),
        top_ppm(3).alias("top3_ppm"),
        top_ppm(4).alias("top4_ppm"),
        F.expr(
            "(aggregate(array_distinct(flatten(transform(_dupstarts, "
            "i -> sequence(i, i + 4)))), cast(0 as bigint), "
            "(acc, p) -> acc + length(element_at(t, p))) * 1000000) div sum_chars"
        ).alias("dup5_ppm"),
    )


@register(
    "q_corpus_report",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t,
         md5(text) AS fp
  FROM documents
),
sig AS (
  SELECT doc_id, lang, source, fp,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS sum_chars,
         CAST(len(list_filter(['the','a','of','and','is'],
                              s -> list_contains(t, s))) AS BIGINT) AS n_stop
  FROM tok
),
dup AS (
  SELECT fp, COUNT(*) AS n FROM sig GROUP BY fp
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(s.n_words) AS BIGINT) AS n_tokens,
       COUNT(DISTINCT s.lang) AS n_langs,
       COUNT(DISTINCT s.source) AS n_sources,
       CAST(SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
       CAST(SUM(CASE WHEN s.n_words < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
       CAST(SUM(CASE WHEN s.n_words >= 50 AND s.n_words <= 100000
                 AND 3 * s.n_words <= s.sum_chars
                 AND s.sum_chars <= 10 * s.n_words
                 AND s.n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
       (CAST(SUM(s.n_words) AS BIGINT) * 1000) // COUNT(*) AS mean_words_x1000
FROM sig s JOIN dup d USING (fp)
""",
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health report — the single-row sanity aggregate every
    training pipeline runs before committing compute: document/token
    totals, language and source cardinality, exact-duplicate share,
    short-doc share, Gopher-rule pass count (symbol/alpha rules are
    vacuous on this corpus and elided), and integer mean words per doc
    (x1000 floor — never a rounded double).

    Scale shape: one scan computes every per-doc signal as map-side
    expressions; the only shuffles are the 16-byte fingerprint
    groupBy (exact-dup share — the q_dedup_exact reduction) and the
    final single-row aggregate, which is map-side combinable with two
    approx-free DISTINCT counts over tiny cardinalities.  At 100 TB
    swap the exact COUNT(DISTINCT lang/source) for approx_count_distinct
    if the key cardinality ever stops being driver-sized; everything
    else is already linear.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.expr(_Q_TOKENS).alias("t"),
        F.md5("text").alias("fp"),
    )
    sig = d.select(
        "doc_id",
        "lang",
        "source",
        "fp",
        F.expr("cast(size(t) as bigint)").alias("n_words"),
        F.expr(
            "aggregate(t, cast(0 as bigint), (acc, x) -> acc + length(x))"
        ).alias("sum_chars"),
        F.expr(
            "cast(size(filter(array('the','a','of','and','is'), "
            "s -> array_contains(t, s))) as bigint)"
        ).alias("n_stop"),
    )
    dup = sig.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    joined = sig.join(dup, "fp")
    gopher_ok = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.lit(3) * F.col("n_words") <= F.col("sum_chars"))
        & (F.col("sum_chars") <= F.lit(10) * F.col("n_words"))
        & (F.col("n_stop") >= 2)
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("bigint").alias("n_exact_dup_docs"),
        F.sum(F.when(F.col("n_words") < 20, 1).otherwise(0)).cast("bigint").alias("n_short_docs"),
        F.sum(F.when(gopher_ok, 1).otherwise(0)).cast("bigint").alias("n_gopher_pass"),
    ).select(
        "*",
        F.expr("(n_tokens * 1000) div n_docs").alias("mean_words_x1000"),
    )


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed n-gram feature buckets
_DSIR_K = 50  # selected documents


def dsir_feature_frame(
    df: DataFrame, text_column: str = "text", carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, carry..., b, c): per-document hashed-ngram feature
    counts — the DSIR bag-of-hashed-ngrams representation (unigrams +
    bigrams, md5 mod {B} buckets, WITH multiplicity).  md5 so the
    DuckDB oracle computes byte-identical buckets.  ``carry`` columns
    ride through the explode instead of joining back afterwards — a
    doc-dim join would pit two data-sized sides against each other at
    scale."""
    work = df.where(F.col(text_column).isNotNull()).withColumn(
        "toks", F.expr(f"filter(split(lower({text_column}), ' '), x -> x != '')")
    )
    feats = F.expr(
        "concat(toks, case when size(toks) >= 2 then "
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2))) "
        "else cast(array() as array<string>) end)"
    )
    return (
        work.select("doc_id", *carry, F.explode(feats).alias("g"))
        .select(
            "doc_id",
            *carry,
            (
                F.expr("cast(conv(substr(md5(g), 1, 8), 16, 10) as bigint)")
                % _DSIR_B
            ).alias("b"),
        )
        .groupBy("doc_id", *carry, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


_DSIR_FEATS_SQL = f"""
toks AS (
  SELECT doc_id, lang, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, lang, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks WHERE len(t) >= 2
),
docb AS (
  SELECT doc_id, lang, (('0x' || substr(md5(g), 1, 8))::BIGINT) % {_DSIR_B} AS b,
         COUNT(*) AS c
  FROM feats GROUP BY doc_id, lang, b
)
"""


@register(
    "q_dsir_selection",
    oracle=f"""
WITH {_DSIR_FEATS_SQL},
tb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM docb WHERE lang = 'en' GROUP BY b),
rb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM docb WHERE lang <> 'en' GROUP BY b),
tot AS (
  SELECT (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tb) AS nt,
         (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) FROM rb) AS nr
),
spine AS (SELECT unnest(generate_series(0, {_DSIR_B - 1})) AS b),
lnr AS (
  SELECT s.b,
         CAST(ROUND(LN(
           CAST((COALESCE(tb.ct, 0) + 1) * (t.nr + {_DSIR_B}) AS DOUBLE)
           / CAST((COALESCE(rb.cr, 0) + 1) * (t.nt + {_DSIR_B}) AS DOUBLE)
         ) * 100000000) AS BIGINT) AS lnr_i8
  FROM spine s LEFT JOIN tb ON tb.b = s.b LEFT JOIN rb ON rb.b = s.b CROSS JOIN tot t
),
wts AS (
  SELECT d.doc_id, d.lang, CAST(SUM(d.c) AS BIGINT) AS n_feats,
         CAST(SUM(d.c * l.lnr_i8) AS BIGINT) AS w_micro8
  FROM docb d JOIN lnr l USING (b) WHERE d.lang <> 'en'
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_feats, w_micro8,
       ROW_NUMBER() OVER (ORDER BY w_micro8 DESC, doc_id) AS rk
FROM wts QUALIFY rk <= {_DSIR_K}
""",
)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): select from the raw pool the documents most distributed
    like a trusted target corpus, by importance weight under two
    bag-of-hashed-ngrams models.  Target here: the 'en' slice of the
    documents table; pool: everything else; feature space: unigrams +
    bigrams hashed into {B} buckets; per-doc log weight
    w = sum_b c_b * ln(p_target(b) / p_raw(b)) with add-one smoothing.
    The top-{K} by weight are the selection (deterministic variant of
    the paper's Gumbel resampling — rank by weight with doc_id
    tie-break, so the result is reproducible).

    Determinism: per-bucket log-ratios round ONCE to integer 1e-8
    units (margins measured in tests/test_oracle_fragility.py — the
    surprisal-family pattern); everything downstream is BIGINT, so
    per-doc weights are exact integer sums in both engines.  (A
    DECIMAL formulation was tried first and failed parity: Spark caps
    long*decimal(20,8) products at precision 38 with scale loss, so
    exact-looking decimal sums silently round — integer units avoid
    the whole class.)

    Scale: both n-gram models are {B}-row aggregates (map-side
    combinable, broadcast back); per-doc weights are one join of the
    (doc, bucket, count) frame — at most {B} rows per document,
    usually far fewer — against the broadcast log-ratio table plus a
    map-side-combinable sum.  The top-k filter over the global
    row_number compiles to WindowGroupLimit (partial per-partition
    top-k before the single-group exchange).  Text is read once for
    feature extraction and never moves; int64 bucket-count products
    are safe to ~10^12 tokens per class — promote the LN operands to
    DECIMAL(38,0) beyond that (the mixture task's documented
    promotion).
    """
    d = _fan_out(
        T(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        spark,
        sf_dir,
    )
    # eager: the lnr broadcast is built on a separate driver thread and
    # used to race the weight pass into 3-4 full re-evaluations of the
    # feature extraction (profiled r14) — materialise the cache once,
    # then every consumer reads it
    docb = persist_tracked(dsir_feature_frame(d, carry=("lang",)), eager=True)
    # both n-gram models in ONE pass over the cached feature frame:
    # sum(c) conditioned per class — sum() skips the NULLs the when()
    # leaves, and dsir_lnr_frame's coalesce(·, 0) treats a NULL count
    # exactly like the absent row the separate where() frames produced
    models = persist_tracked(
        docb.groupBy("b").agg(
            F.sum(F.when(F.col("lang") == "en", F.col("c"))).alias("ct"),
            F.sum(F.when(F.col("lang") != "en", F.col("c"))).alias("cr"),
        ),
        eager=True,  # ≤ _DSIR_B rows; read 4x by dsir_lnr_frame's joins
    )
    tb = models.select("b", "ct")
    rb = models.select("b", "cr")
    lnr = dsir_lnr_frame(spark, tb, rb)
    w = Window.orderBy(F.desc("w_micro8"), "doc_id")
    return (
        dsir_weight_frame(docb.where(F.col("lang") != "en"), lnr, extra=["lang"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _DSIR_K)
        .select("doc_id", "lang", "n_feats", "w_micro8", "rk")
    )


def dsir_lnr_frame(spark: SparkSession, tb: DataFrame, rb: DataFrame) -> DataFrame:
    """(b, lnr_i8): the smoothed log importance ratio per feature
    bucket in integer 1e-8 units, from target bucket counts
    ``tb`` (b, ct) and raw bucket counts ``rb`` (b, cr).  A {B}-row
    frame — broadcast it."""
    tot = tb.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")).crossJoin(
        rb.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    )
    spine = spark.range(_DSIR_B).select(F.col("id").alias("b"))
    return (
        spine.join(tb, "b", "left")
        .join(rb, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.expr(
                f"cast(round(ln("
                f"cast((coalesce(ct, 0) + 1) * (nr + {_DSIR_B}) as double)"
                f" / cast((coalesce(cr, 0) + 1) * (nt + {_DSIR_B}) as double)"
                f") * 100000000) as bigint)"
            ).alias("lnr_i8"),
        )
    )


def dsir_weight_frame(
    docb: DataFrame, lnr: DataFrame, extra: list[str] | None = None
) -> DataFrame:
    """(doc_id, extra..., n_feats, w_micro8): per-document DSIR
    importance weights — one broadcast join of the (doc, bucket, count)
    frame against the log-ratio table, then a map-side-combinable
    integer sum."""
    keys = ["doc_id", *(extra or [])]
    return (
        docb.join(F.broadcast(lnr), "b")
        .groupBy(*keys)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lnr_i8")).alias("w_micro8"),
        )
    )


# ---------------------------------------------------------------------------
# Luhn-validated card detection
# ---------------------------------------------------------------------------

# planted card-like numbers: every 10th doc gets one Luhn-VALID and one
# Luhn-INVALID 16-digit candidate — regex-only scanners flag both, the
# checksum separates them
_SPARK_CARD_CORPUS = (
    "CASE WHEN doc_id % 10 = 0 THEN text || "
    "' pay 4532015112830366 not 4532015112830367 end' ELSE text END"
)
_SQL_CARD_CORPUS = (
    "CASE WHEN doc_id % 10 = 0 THEN text || "
    "' pay 4532015112830366 not 4532015112830367 end' ELSE text END"
)
_CARD_RE = "[0-9]{13,19}"

# Luhn checksum over a digit string c (engine-portable integer
# arithmetic): reverse, double every second digit, fold >9 by -9, sum
# mod 10 == 0.  ascii(digit)-48 keeps everything integer.
_SPARK_LUHN_OK = (
    "aggregate(transform(sequence(1, length(c)), i -> "
    "case when i % 2 = 1 then ascii(substr(reverse(c), i, 1)) - 48 "
    "else 2 * (ascii(substr(reverse(c), i, 1)) - 48) "
    "- case when ascii(substr(reverse(c), i, 1)) - 48 > 4 then 9 else 0 end end), "
    "0, (acc, x) -> acc + x) % 10 = 0"
)
_SQL_LUHN_OK = (
    "list_aggregate(list_transform(generate_series(1, len(c)), i -> "
    "CASE WHEN i % 2 = 1 THEN ascii(substr(reverse(c), i, 1)) - 48 "
    "ELSE 2 * (ascii(substr(reverse(c), i, 1)) - 48) "
    "- CASE WHEN ascii(substr(reverse(c), i, 1)) - 48 > 4 THEN 9 ELSE 0 END END), "
    "'sum') % 10 = 0"
)


@register(
    "q_pii_luhn",
    oracle=f"""
WITH corpus AS (SELECT doc_id, {_SQL_CARD_CORPUS} AS text FROM documents),
cand AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_CARD_RE}')) AS c
  FROM corpus
)
SELECT doc_id,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN {_SQL_LUHN_OK} THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_cards
FROM cand GROUP BY doc_id
""",
)
def q_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated payment-card detection: regex candidates
    (13-19 digit runs) are validated with the Luhn checksum before
    counting as PII — the production refinement over regex-only
    scanning, whose candidate set is mostly false positives on numeric
    corpora.  Each planted doc must report exactly 2 candidates and 1
    valid card (the second plant fails the checksum by construction).

    Pure integer map-side work: the checksum is a per-candidate
    higher-order fold (ascii digits, double-and-fold-9, mod 10) — no
    FP, no shuffle beyond the per-doc count aggregate.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPARK_CARD_CORPUS).alias("text")
    )
    cand = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(_CARD_RE), 0)).alias("c"),
    )
    return cand.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.expr(_SPARK_LUHN_OK), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid_cards"),
    )


@register(
    "q_mixture_upsample",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
stats AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS grp_tokens
  FROM tok GROUP BY source
),
weighted AS (
  SELECT source, n_docs, grp_tokens,
         {isqrt_sql('grp_tokens')} AS w_sqrt
  FROM stats
),
tot AS (
  SELECT CAST(SUM(grp_tokens) AS BIGINT) AS tot_tokens,
         CAST(SUM(w_sqrt) AS BIGINT) AS sum_w
  FROM weighted
),
rated AS (
  SELECT w.source, w.n_docs, w.grp_tokens, w.w_sqrt,
         (t.tot_tokens * w.w_sqrt * 1000) // (t.sum_w * w.grp_tokens) AS rate_pm
  FROM weighted w CROSS JOIN tot t
),
copies AS (
  SELECT r.source, r.n_docs, r.grp_tokens, r.rate_pm, k.n_tokens,
         r.rate_pm // 1000
         + CASE WHEN CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000 < r.rate_pm % 1000 THEN 1 ELSE 0 END AS n_copies
  FROM tok k JOIN rated r USING (source)
)
SELECT source, n_docs, grp_tokens, rate_pm,
       CAST(SUM(n_copies) AS BIGINT) AS docs_emitted,
       CAST(SUM(n_copies * n_tokens) AS BIGINT) AS tokens_emitted
FROM copies GROUP BY source, n_docs, grp_tokens, rate_pm
""",
)
def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture WITH upsampling (epochs): when a group's
    solved per-mille rate exceeds 1000, rare domains are REPEATED —
    every doc contributes floor(rate/1000) full epochs and one more
    iff its content-hash bucket falls under rate mod 1000 (so the
    fractional epoch is a deterministic subset, not a random one).
    The capped variant (q_mixture_temperature) drops the surplus
    instead; this is the DoReMi/mT5-style rebalance where tail
    languages are upsampled into repetition on purpose, with a full
    corpus-token budget so head groups sit under 1000 and tail groups
    above.

    Integer end-to-end: exact isqrt weights, floor-division rates,
    hash-bucket fractions — no FP anywhere.  Scale: two tiny
    broadcast frames (group stats, totals) and one map-side n_copies
    computation; materialising the epochs is a row-local
    explode(sequence(1, n_copies)) the mixture task applies — the
    plan never shuffles the corpus.
    """
    from sayn_spark.functions.content_filter import isqrt_sql

    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.expr("size(filter(split(lower(text), ' '), x -> x != ''))").alias(
            "n_tokens"
        ),
    )
    stats = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("grp_tokens")
    )
    weighted = stats.withColumn("w_sqrt", F.expr(isqrt_sql("grp_tokens")))
    tot = weighted.agg(
        F.sum("grp_tokens").alias("tot_tokens"), F.sum("w_sqrt").alias("sum_w")
    )
    rated = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "grp_tokens",
        F.expr("(tot_tokens * w_sqrt * 1000) div (sum_w * grp_tokens)").alias(
            "rate_pm"
        ),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 1000"
    )
    copies = tok.join(F.broadcast(rated), "source").select(
        "source",
        "n_docs",
        "grp_tokens",
        "rate_pm",
        "n_tokens",
        (
            F.expr("rate_pm div 1000")
            + F.when(bucket < F.col("rate_pm") % 1000, 1).otherwise(0)
        ).alias("n_copies"),
    )
    return copies.groupBy("source", "n_docs", "grp_tokens", "rate_pm").agg(
        F.sum("n_copies").cast("bigint").alias("docs_emitted"),
        F.expr("cast(sum(n_copies * n_tokens) as bigint)").alias("tokens_emitted"),
    )


# --- C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2) ---
#
# The published heuristics operate on page *lines*: keep only lines
# that end in terminal punctuation, have >= 5 words, and do not
# mention javascript; drop whole pages containing "lorem ipsum" or a
# curly brace; require >= 3 surviving sentences per page.  The
# synthetic corpus is a flat token stream, so the registered query
# synthesises a deterministic page per doc (10-word lines, punctuation
# assigned by an integer hash, javascript / lorem-ipsum / brace plants
# on fixed doc_id residues) — both engines build the identical page,
# and the rules must recover exactly the planted violations.


def c4_line_keep_sql(line: str = "l", min_words_per_line: int = 5) -> str:
    """The three C4 line rules as one portable boolean SQL expression
    over a single line (used inside higher-order filter() lambdas):
    terminal punctuation, a word-count floor, and no javascript
    mention.  Pure string/integer tests — boundary-free."""
    return (
        f"right({line}, 1) in ('.', '!', '?', '\"') "
        f"and size(split({line}, ' ')) >= {int(min_words_per_line)} "
        f"and instr(lower({line}), 'javascript') = 0"
    )


def c4_signal_cols(lines: str = "lines", min_words_per_line: int = 5) -> dict:
    """Per-page C4 signals over a lines-array column — shared by
    q_quality_c4_rules and the filter task's ``scorer: c4`` so the
    task decision carries the query's oracle evidence.  Every signal
    is a row-local higher-order fold over the page's own lines (the
    zero-exchange shape): no explode, no shuffle, no UDF."""
    keep = c4_line_keep_sql("l", min_words_per_line)
    return {
        "n_lines": F.expr(f"cast(size({lines}) as bigint)"),
        "n_kept_lines": F.expr(
            f"cast(size(filter({lines}, l -> {keep})) as bigint)"
        ),
        "kept_words": F.expr(
            f"aggregate(filter({lines}, l -> {keep}), cast(0 as bigint), "
            f"(acc, l) -> acc + size(split(l, ' ')))"
        ),
        "has_lorem": F.expr(
            f"case when exists({lines}, "
            f"l -> instr(lower(l), 'lorem ipsum') > 0) then 1 else 0 end"
        ),
        "has_brace": F.expr(
            f"case when exists({lines}, l -> instr(l, '{{') > 0) "
            f"then 1 else 0 end"
        ),
    }


def c4_keep_col(min_sentences: int = 3):
    """Page-level C4 gate over bound c4_signal_cols outputs: no
    lorem-ipsum boilerplate, no curly brace, and at least
    ``min_sentences`` surviving lines (each kept line ends in terminal
    punctuation, C4's sentence proxy)."""
    return (
        (F.col("has_lorem") == 0)
        & (F.col("has_brace") == 0)
        & (F.col("n_kept_lines") >= F.lit(int(min_sentences)))
    )


def c4_clean_text_col(lines: str = "lines", min_words_per_line: int = 5):
    """The rewritten page: surviving lines re-joined with newlines —
    C4 removes offending lines rather than dropping the page (page
    drops are the lorem/brace/min-sentence rules)."""
    keep = c4_line_keep_sql("l", min_words_per_line)
    return F.expr(f"array_join(filter({lines}, l -> {keep}), '\\n')")


_C4_LINES_SPARK = (
    "transform(sequence(0, (size(t) - 1) div 10), i -> concat("
    "array_join(slice(t, cast(i * 10 + 1 as int), 10), ' '), "
    "case when doc_id % 7 = 0 and i = 0 then ' javascript' else '' end, "
    "element_at(array('.', '!', '?', ''), cast((doc_id * 31 + i) % 4 + 1 as int))"
    "))"
)


@register(
    "q_quality_c4_rules",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
pages AS (
  SELECT doc_id,
         list_transform(generate_series(0, (len(t) - 1) // 10), i ->
           array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ') ||
           CASE WHEN doc_id % 7 = 0 AND i = 0 THEN ' javascript' ELSE '' END ||
           (['.', '!', '?', ''])[(doc_id * 31 + i) % 4 + 1]
         ) AS lines0
  FROM tok WHERE len(t) >= 1
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN list_append(l1, 'var config = { a: 1 };') ELSE l1 END AS lines
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0
                    THEN list_append(lines0, 'lorem ipsum dolor sit amet.')
                    ELSE lines0 END AS l1
        FROM pages)
),
lns AS (
  SELECT doc_id, line,
         CAST(len(string_split(line, ' ')) AS BIGINT) AS nw,
         (right(line, 1) IN ('.', '!', '?', '"')
          AND len(string_split(line, ' ')) >= 5
          AND strpos(lower(line), 'javascript') = 0) AS keep
  FROM (SELECT doc_id, unnest(lines) AS line FROM planted)
),
sig AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
         CAST(COALESCE(SUM(CASE WHEN keep THEN nw END), 0) AS BIGINT) AS kept_words,
         MAX(CASE WHEN strpos(lower(line), 'lorem ipsum') > 0 THEN 1 ELSE 0 END)
           AS has_lorem,
         MAX(CASE WHEN strpos(line, '{') > 0 THEN 1 ELSE 0 END) AS has_brace
  FROM lns GROUP BY doc_id
)
SELECT doc_id, n_lines, n_kept_lines, kept_words, has_lorem, has_brace,
       CASE WHEN has_lorem = 0 AND has_brace = 0 AND n_kept_lines >= 3
            THEN 1 ELSE 0 END AS c4_keep
FROM sig
""",
)
def q_quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, §2.2): line-level
    retention (terminal punctuation, >= 5 words, no javascript) plus
    page-level drops (lorem ipsum, curly braces, >= 3 surviving
    sentences) — the published rule suite that produced C4 from
    Common Crawl, complementing the Gopher gate's token-statistics
    rules.

    The page structure is synthesised deterministically (10-word
    lines; punctuation by ``(doc_id*31 + i) % 4``; javascript planted
    on line 0 of ``doc_id % 7 == 0``; a lorem-ipsum line on ``% 11``;
    a brace line on ``% 13``), so both engines score the identical
    page and every planted violation must be recovered exactly.

    Scale shape: page synthesis and all five signals are row-local
    higher-order folds over the doc's own line array — zero
    exchanges, no UDF, linear in corpus bytes; the DuckDB oracle
    stays relational (unnest + group by) and independently certifies
    the fold.  The same builders power ``scorer: c4`` in the filter
    task (real corpora split pages on newlines) and its stateless
    streaming mirror.
    """
    d = (
        _fan_out(
            T(spark, sf_dir, "documents").select("doc_id", "text"), spark, sf_dir
        )
        .select("doc_id", F.expr(_Q_TOKENS).alias("t"))
        .where(F.expr("size(t) >= 1"))
        .withColumn("lines", F.expr(_C4_LINES_SPARK))
        .withColumn(
            "lines",
            F.expr(
                "case when doc_id % 11 = 0 then "
                "concat(lines, array('lorem ipsum dolor sit amet.')) "
                "else lines end"
            ),
        )
        .withColumn(
            "lines",
            F.expr(
                "case when doc_id % 13 = 0 then "
                "concat(lines, array('var config = { a: 1 };')) "
                "else lines end"
            ),
        )
    )
    sig = d.select(
        "doc_id", *(c.alias(k) for k, c in c4_signal_cols().items())
    )
    return sig.withColumn("c4_keep", c4_keep_col().cast("int"))


# --- CCNet-style boilerplate line dedup (Wenzek et al. 2020) ----------
#
# CCNet's first stage removes *paragraphs* that repeat across many
# pages (navigation, footers, cookie banners) before any model-based
# scoring.  Line granularity here: a line occurring in >= min_docs
# distinct documents is boilerplate and is removed from every page.


def boilerplate_rewrite(pages: DataFrame, min_docs: int = 5) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, n_boiler_lines, cleaned_text)
    over a (doc_id, lines array<string>) frame — the engine behind
    q_dedup_boilerplate_lines and the dedup task's ``method: lines``.

    Scale shape: lines shuffle once as md5 fingerprints for the
    distinct-doc frequency count (map-side partial aggregation); the
    frequent set is joined back and surviving lines re-assemble with
    one per-doc aggregate.  Both joins are shuffle_hash-pinned: the
    frequency table is post-aggregate (underestimated) and the line
    stream is post-explode (also underestimated) — either side
    becoming a broadcast build would materialise a corpus-sized hash
    table on every executor.
    """
    lns = pages.select(
        "doc_id", F.posexplode("lines").alias("pos", "line")
    ).withColumn("h", F.md5("line"))
    boiler = (
        lns.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select("h")
    )
    re = (
        lns.join(boiler.hint("shuffle_hash"), "h", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept_lines"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, line))), "
                "s -> s.line), '\\n')"
            ).alias("cleaned_text"),
        )
    )
    return (
        pages.select("doc_id", F.expr("cast(size(lines) as bigint)").alias("n_lines"))
        .join(re.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept_lines", F.lit(0)).cast("bigint").alias("n_kept_lines"),
            (F.col("n_lines") - F.coalesce("n_kept_lines", F.lit(0)))
            .cast("bigint")
            .alias("n_boiler_lines"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


_BOILER_FOOTER = "subscribe to our newsletter for daily updates."
_BOILER_RIGHTS = "all rights reserved by the site owner."


@register(
    "q_dedup_boilerplate_lines",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
pages AS (
  SELECT doc_id,
         list_transform(generate_series(0, (len(t) - 1) // 10), i ->
           array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ') ||
           (['.', '!', '?', ''])[(doc_id * 31 + i) % 4 + 1]
         ) AS lines0
  FROM tok WHERE len(t) >= 1
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN list_append(l1, '{_BOILER_RIGHTS}') ELSE l1 END AS lines
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN list_append(lines0, '{_BOILER_FOOTER}')
                    ELSE lines0 END AS l1
        FROM pages)
),
lns AS (
  SELECT doc_id, s.pos AS pos, s.line AS line FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(lines)),
           i -> struct_pack(pos := i, line := lines[i]))) AS s
    FROM planted)
),
boiler AS (
  SELECT line FROM lns GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 10
),
re AS (
  SELECT l.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_kept_lines,
         md5(string_agg(l.line, chr(10) ORDER BY l.pos)) AS clean_hash
  FROM lns l LEFT JOIN boiler b ON l.line = b.line
  WHERE b.line IS NULL
  GROUP BY l.doc_id
)
SELECT p.doc_id,
       CAST(len(p.lines) AS BIGINT) AS n_lines,
       COALESCE(r.n_kept_lines, 0) AS n_kept_lines,
       CAST(len(p.lines) - COALESCE(r.n_kept_lines, 0) AS BIGINT)
         AS n_boiler_lines,
       COALESCE(r.clean_hash, md5('')) AS clean_hash
FROM planted p LEFT JOIN re r ON p.doc_id = r.doc_id
""",
)
def q_dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020): a line
    occurring in >= 10 distinct documents is boilerplate (navigation,
    footers, legal text) and is removed from every page; surviving
    lines re-assemble in order and the full cleaned text is
    hash-certified.  Pages are synthesised as in q_quality_c4_rules
    (10-word lines, hash-assigned punctuation) plus two planted
    boilerplate lines — a footer on ``doc_id % 3 == 0`` (~33% of
    docs) and a rights notice on ``% 5`` (~20%) — which must be the
    ONLY lines removed: every natural 10-token line is unique at any
    scale factor.

    Scale shape (boilerplate_rewrite): one map-side-combinable
    distinct-doc count over md5 line fingerprints, one
    shuffle_hash-pinned anti-join, one per-doc re-assembly aggregate
    — the frequency pass never moves text, only 16-byte fingerprints,
    and the known explode/post-aggregate size-underestimates are
    pinned away from broadcast.
    """
    pages = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_Q_TOKENS).alias("t"))
        .where(F.expr("size(t) >= 1"))
        .withColumn(
            "lines",
            F.expr(
                "transform(sequence(0, (size(t) - 1) div 10), i -> concat("
                "array_join(slice(t, cast(i * 10 + 1 as int), 10), ' '), "
                "element_at(array('.', '!', '?', ''), "
                "cast((doc_id * 31 + i) % 4 + 1 as int))))"
            ),
        )
        .withColumn(
            "lines",
            F.expr(
                f"case when doc_id % 3 = 0 then "
                f"concat(lines, array('{_BOILER_FOOTER}')) else lines end"
            ),
        )
        .withColumn(
            "lines",
            F.expr(
                f"case when doc_id % 5 = 0 then "
                f"concat(lines, array('{_BOILER_RIGHTS}')) else lines end"
            ),
        )
    )
    out = boilerplate_rewrite(pages, min_docs=10)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_boiler_lines",
        F.md5("cleaned_text").alias("clean_hash"),
    )


# --- MassiveText duplicate-line signals (Rae et al. 2021, App. A1.1) --
#
# The two Gopher repetition rules the n-gram coverage family doesn't
# cover: the fraction of LINES that are duplicates of an earlier line
# in the same document, and the fraction of CHARACTERS inside those
# duplicated lines (all-but-first occurrences count, the standard
# reimplementation).  Both are per-document and integer-ppm.


def dup_line_signal_cols(lines: str = "lines") -> dict:
    """Row-local duplicate-line signals over a lines-array column —
    shared by q_repetition_dup_lines and the filter task's repetition
    bounds (max_dup_line_ppm / max_dup_char_ppm).  n_dup_lines/chars
    are total-minus-distinct folds over the doc's own array: zero
    exchanges, boundary-free integers."""
    return {
        "n_lines": F.expr(f"cast(size({lines}) as bigint)"),
        "n_dup_lines": F.expr(
            f"cast(size({lines}) - size(array_distinct({lines})) as bigint)"
        ),
        "sum_chars": F.expr(
            f"aggregate({lines}, cast(0 as bigint), (acc, l) -> acc + length(l))"
        ),
        "n_dup_chars": F.expr(
            f"aggregate({lines}, cast(0 as bigint), (acc, l) -> acc + length(l)) "
            f"- aggregate(array_distinct({lines}), cast(0 as bigint), "
            f"(acc, l) -> acc + length(l))"
        ),
    }


@register(
    "q_repetition_dup_lines",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
pages AS (
  SELECT doc_id,
         list_transform(generate_series(0, (len(t) - 1) // 10), i ->
           array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ') ||
           (['.', '!', '?', ''])[(doc_id * 31 + i) % 4 + 1]
         ) AS lines0
  FROM tok WHERE len(t) >= 1
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0 THEN l1 || list_slice(l1, 1, 2) ELSE l1 END
           AS lines
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN list_append(lines0, lines0[1])
                    ELSE lines0 END AS l1
        FROM pages)
),
sig AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS n_dup_lines,
         CAST(list_sum(list_transform(lines, l -> len(l))) AS BIGINT) AS sum_chars,
         CAST(list_sum(list_transform(lines, l -> len(l)))
              - list_sum(list_transform(list_distinct(lines), l -> len(l)))
           AS BIGINT) AS n_dup_chars
  FROM planted
)
SELECT doc_id, n_lines, n_dup_lines, sum_chars, n_dup_chars,
       CAST(n_dup_lines * 1000000 // n_lines AS BIGINT) AS dup_line_ppm,
       CAST(n_dup_chars * 1000000 // sum_chars AS BIGINT) AS dup_char_ppm
FROM sig
""",
)
def q_repetition_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText duplicate-line repetition signals (Rae et al. 2021,
    App. A1.1): per document, the ppm of lines that duplicate an
    earlier line and the ppm of characters inside those duplicates —
    the two published Gopher repetition rules the n-gram coverage
    suite (q_repetition_top_ngram) doesn't express.  Pages are
    synthesised as in q_quality_c4_rules; within-doc duplicates are
    planted (a copy of line 1 on ``doc_id % 4 == 0``, copies of lines
    1-2 on ``% 6``) and natural lines never collide, so the expected
    signal is exact by construction.

    All-but-first occurrences count as duplicates (total minus
    distinct — the standard reimplementation); everything is a
    row-local fold over the doc's own line array: zero exchanges, no
    UDF, integer ppm by floor division (never round(k/n)).
    """
    pages = (
        _fan_out(
            T(spark, sf_dir, "documents").select("doc_id", "text"), spark, sf_dir
        )
        .select("doc_id", F.expr(_Q_TOKENS).alias("t"))
        .where(F.expr("size(t) >= 1"))
        .withColumn(
            "lines",
            F.expr(
                "transform(sequence(0, (size(t) - 1) div 10), i -> concat("
                "array_join(slice(t, cast(i * 10 + 1 as int), 10), ' '), "
                "element_at(array('.', '!', '?', ''), "
                "cast((doc_id * 31 + i) % 4 + 1 as int))))"
            ),
        )
        .withColumn(
            "lines",
            F.expr(
                "case when doc_id % 4 = 0 then "
                "concat(lines, array(element_at(lines, 1))) else lines end"
            ),
        )
        .withColumn(
            "lines",
            F.expr(
                "case when doc_id % 6 = 0 then "
                "concat(lines, slice(lines, 1, 2)) else lines end"
            ),
        )
    )
    sig = pages.select(
        "doc_id", *(c.alias(k) for k, c in dup_line_signal_cols().items())
    )
    return sig.select(
        "*",
        F.expr("(n_dup_lines * 1000000) div n_lines").alias("dup_line_ppm"),
        F.expr("(n_dup_chars * 1000000) div sum_chars").alias("dup_char_ppm"),
    )


# ---------------------------------------------------------------------------
# Decontamination overlap report (the GPT-3 appendix-C measurement step)
# ---------------------------------------------------------------------------


@register(
    "q_decontaminate_report",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
ev AS (
  SELECT 'eval_a' AS eval_set, t[3:12] AS s FROM toks
  WHERE doc_id % 9 = 0 AND len(t) >= 12
  UNION ALL
  SELECT 'eval_b' AS eval_set, list_concat(t[5:13], ['qq']) AS s FROM toks
  WHERE doc_id % 7 = 0 AND len(t) >= 13
),
ev_g AS (
  SELECT DISTINCT eval_set,
         hash(unnest(list_transform(generate_series(1, len(s) - 7),
              i -> array_to_string(s[i:i+7], ' ')))) AS h
  FROM ev
),
src_g AS (
  SELECT DISTINCT doc_id,
         hash(unnest(list_transform(generate_series(1, len(t) - 7),
              i -> array_to_string(t[i:i+7], ' ')))) AS h
  FROM toks WHERE len(t) >= 8
),
corpus_h AS (SELECT DISTINCT h FROM src_g),
hits AS (
  SELECT e.eval_set, e.h, (c.h IS NOT NULL) AS hit
  FROM ev_g e LEFT JOIN corpus_h c USING (h)
),
contam AS (
  SELECT e.eval_set, COUNT(DISTINCT s.doc_id) AS n_docs
  FROM ev_g e JOIN src_g s USING (h) GROUP BY e.eval_set
)
SELECT h.eval_set,
       CAST(COUNT(*) AS BIGINT) AS n_eval_grams,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_grams,
       CAST((SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
         AS hit_ppm,
       CAST(COALESCE(MAX(c.n_docs), 0) AS BIGINT) AS n_contaminated_docs
FROM hits h LEFT JOIN contam c ON c.eval_set = h.eval_set
GROUP BY h.eval_set
""",
)
def q_decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination overlap REPORT — the measurement the GPT-3
    appendix publishes before any dropping happens: for each held-out
    eval set, how many of its n-grams appear anywhere in the training
    corpus (count + ppm) and how many training documents carry at
    least one of them.  Two planted sets exercise both regimes:
    eval_a is clean corpus spans (full overlap by construction),
    eval_b's spans end in an out-of-corpus token, so only its
    prefix-grams hit — the report shows the partial-overlap signature
    a real benchmark leak produces.

    Determinism: overlap is exact n-gram set membership — each engine
    hashes with its OWN 64-bit function (Spark xxhash64, DuckDB hash;
    they are not bit-identical, but membership and counts depend only
    on string equality, so collision-free hashing gives identical
    metrics) — and every metric is an integer (ppm is floor
    division).

    Scale shape: identical to q_decontaminate_ngrams' apply path —
    both sides reduce to 8-byte gram hashes, the eval side (MBs
    against 100 TB) broadcasts into a map-side join, the corpus never
    shuffles text, and the per-set aggregate is a handful of rows.
    Run the report BEFORE the drop to size the blast radius (and
    after, to verify it went to zero)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.expr(_NGRAM_TOKENS).alias("t"))
    ev_a = toks.where(F.expr("doc_id % 9 = 0 AND size(t) >= 12")).select(
        F.lit("eval_a").alias("eval_set"), F.expr("slice(t, 3, 10)").alias("s")
    )
    ev_b = toks.where(F.expr("doc_id % 7 = 0 AND size(t) >= 13")).select(
        F.lit("eval_b").alias("eval_set"),
        F.expr("concat(slice(t, 5, 9), array('qq'))").alias("s"),
    )
    grams = (
        "transform(sequence(1, size(s) - 7), i -> concat_ws(' ', slice(s, i, 8)))"
    )
    ev_g = (
        ev_a.unionByName(ev_b)
        .select("eval_set", F.explode(F.expr(grams)).alias("g"))
        .select("eval_set", F.xxhash64("g").alias("h"))
        .distinct()
    )
    src_g = ngram_hash_frame(d, "text", 8, "doc_id")
    src_g = persist_tracked(src_g)  # read by the hit probe AND the doc count
    corpus_h = src_g.select("h").distinct()
    hits = ev_g.join(
        corpus_h.withColumn("_in", F.lit(1)), "h", "left"
    ).select("eval_set", F.coalesce("_in", F.lit(0)).alias("hit"))
    per_set = hits.groupBy("eval_set").agg(
        F.count(F.lit(1)).alias("n_eval_grams"),
        F.sum("hit").alias("n_hit_grams"),
    )
    contam = (
        src_g.join(F.broadcast(ev_g), "h")
        .groupBy("eval_set")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    return per_set.join(contam, "eval_set", "left").select(
        "eval_set",
        F.col("n_eval_grams").cast("bigint").alias("n_eval_grams"),
        F.col("n_hit_grams").cast("bigint").alias("n_hit_grams"),
        F.expr("cast((n_hit_grams * 1000000) div n_eval_grams as bigint)").alias(
            "hit_ppm"
        ),
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias(
            "n_contaminated_docs"
        ),
    )


def contaminated_ids_frame(
    docs: DataFrame,
    ev: DataFrame,
    ngram: int,
    id_column: str = "doc_id",
    text_column: str = "text",
    eval_text_column: str = "text",
    min_overlap_ppm: int | None = None,
) -> DataFrame:
    """Distinct contaminated-id frame — the ONE predicate behind the
    decontaminate task and its streaming twin (stream == batch by
    construction).  ``min_overlap_ppm is None`` is the any-single-gram
    rule (GPT-3 appendix); an integer ppm switches to per-pair
    containment of an eval document's distinct n-grams
    (q_decontaminate_overlap_frac's engine).  The eval side always
    broadcasts; with the frac rule only matched (doc, eval) pairs
    shuffle into the count."""
    src_hashes = ngram_hash_frame(docs, text_column, ngram, id_column)
    if min_overlap_ppm is None:
        ev_hashes = ngram_hash_frame(ev, eval_text_column, ngram, None)
        return (
            src_hashes.join(F.broadcast(ev_hashes), "h", "left_semi")
            .select(id_column)
            .distinct()
        )
    # Per-pair containment: grams keyed by eval DOCUMENT.  No id column
    # is required on the eval table — xxhash64 of the text is the
    # per-doc key (identical eval texts merge harmlessly: same gram
    # set, same total).
    ev_docs = ev.where(F.col(eval_text_column).isNotNull()).select(
        F.xxhash64(eval_text_column).alias("_eval_id"),
        F.col(eval_text_column).alias("_ev_text"),
    )
    ev_g = ngram_hash_frame(ev_docs, "_ev_text", ngram, "_eval_id")
    ev_n = ev_g.groupBy("_eval_id").agg(F.count(F.lit(1)).alias("_n_ev"))
    return (
        src_hashes.join(F.broadcast(ev_g), "h")
        .groupBy(id_column, "_eval_id")
        .agg(F.count(F.lit(1)).alias("_n_matched"))
        .join(F.broadcast(ev_n), "_eval_id")
        .where(
            F.col("_n_matched") * 1_000_000
            >= F.col("_n_ev") * F.lit(int(min_overlap_ppm))
        )
        .select(id_column)
        .distinct()
    )


_SEM_DIM = 64


def _dense_hash_vectors(
    frame: DataFrame, id_column: str, text_column: str, dim: int = _SEM_DIM
) -> DataFrame:
    """(id, v array<bigint>[dim], l2 bigint) dense feature-hash TF
    vectors (q_feature_hashing's md5-mod-``dim`` bucketing, densified
    row-locally) — integer counts, so every downstream cosine verdict
    can be an exact cross-multiplication."""
    toks = frame.where(F.col(text_column).isNotNull()).select(
        F.col(id_column).alias("id"),
        F.explode(F.expr(_NGRAM_TOKENS.replace("text", text_column))).alias("t"),
    )
    vec = (
        toks.select(
            "id",
            (F.expr("cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint)") % dim).alias(
                "bucket"
            ),
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = (
        vec.groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("m"))
        .select(
            "id",
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                "b -> coalesce(element_at(m, cast(b as bigint)), cast(0 as bigint)))"
            ).alias("v"),
        )
    )
    return dense.withColumn(
        "l2", F.expr("aggregate(v, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )


def semantic_contaminated_ids(
    docs: DataFrame,
    ev: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    eval_text_column: str = "text",
    min_cosine_hundredths: int = 80,
) -> DataFrame:
    """Distinct ids of training documents whose feature-hash TF vector
    has cosine >= h/100 with ANY eval document — SEMANTIC
    decontamination, the complement of the n-gram rules: a reworded or
    reordered eval leak shares few exact n-grams but keeps its bag of
    words.  The verdict is the exact integer cross-multiplication
    ``10000*dot^2 >= h^2*l2a*l2b`` (dot >= 0 — counts are nonnegative),
    evaluated in DECIMAL(38,0) so it stays exact for documents of any
    realistic length (repetitive long docs push the products past
    int64) — no FP boundary anywhere.

    Scale shape: the eval side (benchmarks are MBs against a 100 TB
    corpus) broadcasts as dense {dim}-int vectors; the corpus builds
    its vectors row-locally (explode -> per-doc map -> dense array) and
    the screen is a map-side bounded nested loop over the broadcast
    eval frame — the corpus never shuffles and text never leaves its
    partitions, exactly like the n-gram rules."""
    h = int(min_cosine_hundredths)
    if not 1 <= h <= 100:
        raise ValueError(
            "semantic_contaminated_ids: min_cosine_hundredths must be in [1, 100]"
        )
    src = _dense_hash_vectors(docs, id_column, text_column)
    evv = _dense_hash_vectors(
        ev.select(F.monotonically_increasing_id().alias("_eid"), ev[eval_text_column]),
        "_eid",
        eval_text_column,
    ).select(F.col("v").alias("ev_v"), F.col("l2").alias("ev_l2"))
    dot = F.expr(
        "aggregate(zip_with(v, ev_v, (x, y) -> x * y), cast(0 as bigint), "
        "(acc, p) -> acc + p)"
    )
    # the comparison runs in DECIMAL(38,0): with very repetitive long
    # documents l2 reaches ~1e9 per side, so h^2*l2a*l2b (~1e22) and
    # 10000*dot^2 overflow BIGINT — Spark's non-ANSI multiply would
    # WRAP silently and flag/clear documents arbitrarily.  DECIMAL
    # keeps the verdict exact to 38 digits (the operands cap at ~1e26
    # for billion-element vectors); DuckDB's oracle side already
    # computes in HUGEINT (int128), so both engines stay exact.
    dec = "decimal(38,0)"
    lhs = F.lit(10000).cast(dec) * dot.cast(dec) * dot.cast(dec)
    rhs = F.lit(h * h).cast(dec) * F.col("l2").cast(dec) * F.col("ev_l2").cast(dec)
    return (
        src.crossJoin(F.broadcast(evv))
        .where(lhs >= rhs)
        .select(F.col("id").alias(id_column))
        .distinct()
    )


@register(
    "q_decontaminate_semantic",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
ev AS (
  SELECT doc_id AS eval_id, list_reverse(t) AS t
  FROM toks WHERE doc_id % 9 = 0 AND len(t) >= 8
),
src_b AS (
  SELECT doc_id AS id,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT) % {_SEM_DIM} AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY id, bucket
),
ev_b AS (
  SELECT eval_id,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT) % {_SEM_DIM} AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT eval_id, unnest(t) AS tok FROM ev)
  GROUP BY eval_id, bucket
),
src_l2 AS (SELECT id, CAST(SUM(cnt * cnt) AS BIGINT) AS l2 FROM src_b GROUP BY id),
ev_l2 AS (SELECT eval_id, CAST(SUM(cnt * cnt) AS BIGINT) AS l2 FROM ev_b GROUP BY eval_id),
dots AS (
  SELECT s.id, e.eval_id, CAST(SUM(s.cnt * e.cnt) AS BIGINT) AS dot
  FROM src_b s JOIN ev_b e USING (bucket)
  GROUP BY s.id, e.eval_id
)
SELECT DISTINCT d.id AS contaminated_id
FROM dots d
JOIN src_l2 a ON a.id = d.id
JOIN ev_l2 b ON b.eval_id = d.eval_id
WHERE 10000 * d.dot * d.dot >= 9025 * a.l2 * b.l2
""",
)
def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-cosine) decontamination at threshold 0.95 —
    the screen the n-gram rules structurally cannot provide: the
    planted eval set is every 9th document with its TOKENS REVERSED,
    which shares essentially no 8-gram with its donor (so
    q_decontaminate_ngrams is blind to it) but has the IDENTICAL bag
    of words, cosine exactly 1.0.  The realistic shape is an eval set
    leaking into training data through reformatting, reordering, or
    templated rewording.

    Engine: semantic_contaminated_ids — feature-hash TF vectors
    (md5-mod-64 integer counts, the q_feature_hashing recipe), eval
    side broadcast dense, verdict by exact integer cross-multiplication
    (100*cos)^2 >= 95^2.  The oracle mirrors it with the sparse
    bucket-join formulation — both compute the same integer dot/l2
    values, so parity certifies the densification too.

    Scale shape: map-side screen against a broadcast eval frame (no
    corpus shuffle, no text movement); at 100 TB pair it with the
    n-gram rule in one pass — both are broadcast-side predicates.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.where(F.col("doc_id") % 9 == 0).select(
        F.expr(
            "concat_ws(' ', reverse(filter(split(lower(text), ' '), x -> x != '')))"
        ).alias("text")
    ).where(F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 8)
    return semantic_contaminated_ids(d, ev, min_cosine_hundredths=95).select(
        F.col("doc_id").alias("contaminated_id")
    )


@register(
    "q_decontaminate_overlap_frac",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
ev AS (
  SELECT doc_id AS eval_id, t[3:14] AS s FROM toks
  WHERE doc_id % 9 = 0 AND len(t) >= 14
  UNION ALL
  SELECT doc_id + 1000000 AS eval_id,
         list_concat(t[2:10], ['qz1', 'qz2', 'qz3', 'qz4', 'qz5']) AS s
  FROM toks WHERE doc_id % 11 = 0 AND len(t) >= 10
),
ev_g AS (
  SELECT DISTINCT eval_id,
         hash(unnest(list_transform(generate_series(1, len(s) - 7),
              i -> array_to_string(s[i:i+7], ' ')))) AS h
  FROM ev
),
ev_n AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev_g GROUP BY eval_id),
src_g AS (
  SELECT DISTINCT doc_id,
         hash(unnest(list_transform(generate_series(1, len(t) - 7),
              i -> array_to_string(t[i:i+7], ' ')))) AS h
  FROM toks WHERE len(t) >= 8
),
m AS (
  SELECT s.doc_id, e.eval_id, COUNT(*) AS n_matched
  FROM src_g s JOIN ev_g e USING (h)
  GROUP BY s.doc_id, e.eval_id
)
SELECT m.doc_id, m.eval_id,
       CAST(n.n_ev AS BIGINT) AS n_ev_grams,
       CAST(m.n_matched AS BIGINT) AS n_matched,
       CAST((m.n_matched * 1000000) // n.n_ev AS BIGINT) AS frac_ppm,
       CAST(CASE WHEN 2 * m.n_matched >= n.n_ev THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM m JOIN ev_n n USING (eval_id)
""",
)
def q_decontaminate_overlap_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded-overlap decontamination (the PaLM / GPT-4 rule):
    a (train doc, eval doc) pair is contaminated when >= 50% of the
    eval document's distinct 8-grams appear in that ONE training
    document — per-pair containment, not q_decontaminate_ngrams'
    any-single-gram hit, so a stray idiom shared with an eval question
    no longer nukes the training doc while a near-verbatim paraphrase
    still does.  Two planted eval sets exercise both regimes: clean
    corpus spans (every 9th doc, frac 1.0 against their donor) and
    spans ending in five out-of-corpus tokens (every 11th doc, offset
    by 1e6, only prefix grams hit -> below threshold, emitted with
    contaminated=0 so the report shows the partial-overlap signature).

    Determinism: membership and counts depend only on gram string
    equality (each engine hashes with its own 64-bit function, like
    q_decontaminate_report); every output is an integer — frac_ppm is
    floor division and the threshold test is the integer comparison
    2*n_matched >= n_ev_grams, so no FP boundary exists.

    Scale shape: eval benchmarks are MBs against a 100 TB corpus —
    ev_g broadcasts into a map-side hash join against the corpus gram
    stream, so only the MATCHED (doc_id, eval_id) pairs enter the
    count shuffle (partial aggregation applies); per-eval gram totals
    are a broadcast-sized table joined after the count.  The corpus
    text never shuffles."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.expr(_NGRAM_TOKENS).alias("t"))
    ev_full = toks.where(F.expr("doc_id % 9 = 0 AND size(t) >= 14")).select(
        F.col("doc_id").alias("eval_id"), F.expr("slice(t, 3, 12)").alias("s")
    )
    ev_part = toks.where(F.expr("doc_id % 11 = 0 AND size(t) >= 10")).select(
        (F.col("doc_id") + 1000000).alias("eval_id"),
        F.expr("concat(slice(t, 2, 9), array('qz1','qz2','qz3','qz4','qz5'))").alias(
            "s"
        ),
    )
    grams = (
        "transform(sequence(1, size(s) - 7), i -> concat_ws(' ', slice(s, i, 8)))"
    )
    ev_g = (
        ev_full.unionByName(ev_part)
        .select("eval_id", F.explode(F.expr(grams)).alias("g"))
        .select("eval_id", F.xxhash64("g").alias("h"))
        .distinct()
    )
    ev_g = persist_tracked(ev_g)  # read by the match join AND the totals
    ev_n = ev_g.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_ev"))
    src_g = ngram_hash_frame(d, "text", 8, "doc_id")
    matched = (
        src_g.join(F.broadcast(ev_g), "h")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return matched.join(F.broadcast(ev_n), "eval_id").select(
        "doc_id",
        "eval_id",
        F.col("n_ev").cast("bigint").alias("n_ev_grams"),
        F.col("n_matched").cast("bigint").alias("n_matched"),
        F.expr("cast((n_matched * 1000000) div n_ev as bigint)").alias("frac_ppm"),
        F.expr("cast(case when 2 * n_matched >= n_ev then 1 else 0 end as bigint)").alias(
            "contaminated"
        ),
    )


# --- Trained quality classifier (fastText/CCNet/GPT-3-style NB) --------

# The "looks like the reference corpus" classifier filter: GPT-3
# (Brown et al. 2020, Appendix A) and LLaMA/CCNet (Wenzek et al. 2020)
# keep crawl documents a linear classifier scores as WebText/Wikipedia-
# like.  fastText with unigram features and a log-odds output IS
# multinomial Naive Bayes with add-1 smoothing, which has an exact
# closed form over token counts — no SGD, fully deterministic, and the
# training "state" is one vocabulary-sized count table.
_NB_POS = "source IN ('src0', 'src1')"  # curated "reference" slice
_NB_NEG = "source NOT IN ('src0', 'src1') AND doc_id % 2 = 0"  # crawl sample
_NB_K = 100
_NB_SCALE = 100000000  # llr in integer 1e-8 nat units


def nb_llr_frames(train: DataFrame, pos_pred: str, neg_pred: str):
    """(vocab (w, llr_i8), oov (oov_i8)) — the trained NB classifier.

    ``train`` needs ``text`` plus whatever columns the two predicate
    strings reference.  Per vocabulary word w the log-likelihood ratio

        llr(w) = ln( p(w|pos) / p(w|neg) )
               = ln( ((c_pos+1) * (N_neg+V)) / ((c_neg+1) * (N_pos+V)) )

    with add-1 smoothing over the joint vocabulary V.  Determinism:
    the ratio argument is built from exact BIGINT counts with IEEE-
    correctly-rounded double multiply/divide, so both engines hand the
    SAME double to a SINGLE ln, rounded ONCE into 1e-8 integer units
    (the q_dsir_selection / bigram-LM rule; margins measured in
    tests/test_oracle_fragility.py).  Everything downstream is integer.

    Scale shape: training is one conditional-count aggregate over the
    token stream (map-side combinable, shuffles only (w, c_pos, c_neg)
    rows); the three scalars (N_pos, N_neg, V) are a broadcast
    crossJoin.  The model is vocabulary-sized — broadcast it at apply
    time when it fits (the common case), hash-join on w when not."""
    tr = train.where(F.expr(f"({pos_pred}) OR ({neg_pred})")).select(
        F.expr(f"case when {pos_pred} then 1 else 0 end").alias("is_pos"),
        F.explode(F.expr(_Q_TOKENS)).alias("w"),
    )
    cnt = persist_tracked(
        tr.groupBy("w").agg(
            F.sum("is_pos").cast("bigint").alias("c_pos"),
            F.sum(F.expr("1 - is_pos")).cast("bigint").alias("c_neg"),
        )
    )
    tot = cnt.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    vocab = cnt.crossJoin(F.broadcast(tot)).select(
        "w",
        F.expr(
            f"cast(round(ln((cast(c_pos + 1 as double) * (n_neg + v)) / "
            f"(cast(c_neg + 1 as double) * (n_pos + v))) * {_NB_SCALE}) as bigint)"
        ).alias("llr_i8"),
    )
    oov = tot.select(
        F.expr(
            f"cast(round(ln(cast(n_neg + v as double) / (n_pos + v)) "
            f"* {_NB_SCALE}) as bigint)"
        ).alias("oov_i8")
    )
    return vocab, oov


def score_against_nb(docs: DataFrame, vocab: DataFrame, oov: DataFrame,
                     id_cols: list[str]) -> DataFrame:
    """(id_cols..., n_tokens, sum_llr_i8, avg_llr_i8) — per-document NB
    log-odds under a FROZEN (vocab, oov) model from nb_llr_frames.
    Positive avg = reference-like.  Documents with zero tokens have no
    evidence and are absent (the caller decides their fate).

    The average is SIGN-SAFE floor division — log-odds sums go
    negative, where Spark's truncating ``div`` and DuckDB's flooring
    ``//`` disagree, so the numerator is first snapped down to an
    exact multiple via pmod (identical %-semantics in both engines),
    making truncation and flooring coincide."""
    sc = docs.select(*id_cols, F.explode(F.expr(_Q_TOKENS)).alias("w"))
    scored = (
        sc.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(oov))
        .select(*id_cols, F.coalesce("llr_i8", "oov_i8").alias("t_llr"))
    )
    return (
        scored.groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("t_llr").alias("sum_llr_i8"),
        )
        .withColumn(
            "avg_llr_i8",
            F.expr("(sum_llr_i8 - pmod(sum_llr_i8, n_tokens)) div n_tokens"),
        )
    )


@register(
    "q_quality_nb_classifier",
    oracle=f"""
WITH tr AS (
  SELECT CASE WHEN {_NB_POS} THEN 1 ELSE 0 END AS is_pos,
         unnest({_Q_SQL_TOKENS}) AS w
  FROM documents WHERE ({_NB_POS}) OR ({_NB_NEG})
),
cnt AS (
  SELECT w, CAST(SUM(is_pos) AS BIGINT) AS c_pos,
         CAST(SUM(1 - is_pos) AS BIGINT) AS c_neg
  FROM tr GROUP BY w
),
tot AS (
  SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         COUNT(*) AS v
  FROM cnt
),
vocab AS (
  SELECT w, CAST(ROUND(LN((CAST(c_pos + 1 AS DOUBLE) * (n_neg + v)) /
         (CAST(c_neg + 1 AS DOUBLE) * (n_pos + v))) * {_NB_SCALE}) AS BIGINT) AS llr_i8
  FROM cnt, tot
),
oov AS (
  SELECT CAST(ROUND(LN(CAST(n_neg + v AS DOUBLE) / (n_pos + v))
         * {_NB_SCALE}) AS BIGINT) AS oov_i8
  FROM tot
),
sc AS (
  SELECT doc_id, source, unnest({_Q_SQL_TOKENS}) AS w FROM documents
),
scored AS (
  SELECT s.doc_id, s.source, COALESCE(vb.llr_i8, o.oov_i8) AS t_llr
  FROM sc s LEFT JOIN vocab vb USING (w) CROSS JOIN oov o
),
doc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(t_llr) AS BIGINT) AS sum_llr_i8
  FROM scored GROUP BY doc_id, source
),
avgd AS (
  SELECT *, CAST((sum_llr_i8 - ((sum_llr_i8 % n_tokens) + n_tokens) % n_tokens)
         // n_tokens AS BIGINT) AS avg_llr_i8
  FROM doc
)
SELECT doc_id, source, n_tokens, sum_llr_i8, avg_llr_i8, rk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY avg_llr_i8 DESC, doc_id) AS rk FROM avgd
) WHERE rk <= {_NB_K}
""",
)
def q_quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality-classifier filter — the GPT-3 Appendix-A /
    CCNet (Wenzek et al. 2020) / fastText (Joulin et al. 2016) shape:
    train a multinomial Naive Bayes log-odds model on a curated
    "reference" slice (positive: src0/src1) against a crawl sample
    (negative: every other source's even-doc_id half), then score the
    ENTIRE corpus per token and keep the 100 most reference-like
    documents.  Closed-form count-based training means the classifier
    is exactly reproducible — no SGD order-dependence — while ranking
    identically to a unigram fastText model with log-odds output.

    Determinism: one ln per vocabulary entry over an IEEE-exact double
    argument, rounded ONCE into 1e-8 integer units; per-doc sums are
    BIGINT; the per-doc average uses pmod-snapped floor division so
    NEGATIVE sums divide identically in Spark (truncating div) and
    DuckDB (flooring //) — margins in tests/test_oracle_fragility.py.

    Scale shape: training = one map-side-combinable conditional count
    over the training token stream; model = one vocabulary-sized
    (w, llr_i8) table, broadcast to the scoring join (hash-join on w
    if the vocab outgrows broadcast); scoring = one narrow aggregate
    per doc; top-100 compiles to a windowed group-limit.  The model
    frame can be persisted as a table and reused as a FROZEN filter on
    later crawl snapshots without retraining (the filter task's
    nb_classifier scorer does exactly that)."""
    d = T(spark, sf_dir, "documents")
    vocab, oov = nb_llr_frames(d, _NB_POS, _NB_NEG)
    docsc = score_against_nb(
        d.select("doc_id", "source", "text"), vocab, oov, ["doc_id", "source"]
    )
    w = Window.orderBy(F.desc("avg_llr_i8"), F.col("doc_id"))
    return (
        docsc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _NB_K)
        .select("doc_id", "source", "n_tokens", "sum_llr_i8", "avg_llr_i8", "rk")
    )


@register(
    "q_source_card",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t,
         md5(text) AS fp
  FROM documents
),
sig AS (
  SELECT doc_id, lang, source, fp,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS sum_chars,
         CAST(len(list_filter(['the','a','of','and','is'],
                              s -> list_contains(t, s))) AS BIGINT) AS n_stop
  FROM tok
),
dup AS (
  SELECT fp, COUNT(*) AS n FROM sig GROUP BY fp
)
SELECT s.source,
       COUNT(*) AS n_docs,
       CAST(SUM(s.n_words) AS BIGINT) AS n_tokens,
       COUNT(DISTINCT s.lang) AS n_langs,
       CAST(SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
       CAST((SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
            AS BIGINT) AS dup_ppm,
       CAST(SUM(CASE WHEN s.n_words < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
       CAST(SUM(CASE WHEN s.n_words >= 50 AND s.n_words <= 100000
                 AND 3 * s.n_words <= s.sum_chars
                 AND s.sum_chars <= 10 * s.n_words
                 AND s.n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
       (CAST(SUM(s.n_words) AS BIGINT) * 1000) // COUNT(*) AS mean_words_x1000
FROM sig s JOIN dup d USING (fp)
GROUP BY s.source
""",
)
def q_source_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — q_corpus_report's health signals
    broken down by provenance, the table a curation review reads
    before setting mixture weights: per source, document/token totals,
    language cardinality, exact-duplicate count and ppm (duplication
    is GLOBAL — a doc counted duplicated here may have its twin in
    another source; q_dedup_source_matrix says which), short-doc
    count, Gopher pass count, and integer mean words per doc.

    Scale shape: identical to q_corpus_report (map-side per-doc
    signals, one 16-byte fingerprint groupBy, then a per-source
    aggregate that is map-side combinable); output rows = source
    cardinality — telemetry-sized at any corpus scale."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.expr(_Q_TOKENS).alias("t"),
        F.md5("text").alias("fp"),
    )
    sig = d.select(
        "doc_id",
        "lang",
        "source",
        "fp",
        F.expr("cast(size(t) as bigint)").alias("n_words"),
        F.expr(
            "aggregate(t, cast(0 as bigint), (acc, x) -> acc + length(x))"
        ).alias("sum_chars"),
        F.expr(
            "cast(size(filter(array('the','a','of','and','is'), "
            "s -> array_contains(t, s))) as bigint)"
        ).alias("n_stop"),
    )
    dup = sig.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    joined = sig.join(dup, "fp")
    gopher_ok = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.lit(3) * F.col("n_words") <= F.col("sum_chars"))
        & (F.col("sum_chars") <= F.lit(10) * F.col("n_words"))
        & (F.col("n_stop") >= 2)
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_dup_docs"),
            F.sum(F.when(F.col("n_words") < 20, 1).otherwise(0))
            .cast("bigint")
            .alias("n_short_docs"),
            F.sum(F.when(gopher_ok, 1).otherwise(0))
            .cast("bigint")
            .alias("n_gopher_pass"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            "n_exact_dup_docs",
            F.expr("cast((n_exact_dup_docs * 1000000) div n_docs as bigint)").alias(
                "dup_ppm"
            ),
            "n_short_docs",
            "n_gopher_pass",
            F.expr("(n_tokens * 1000) div n_docs").alias("mean_words_x1000"),
        )
    )


@register(
    "q_pack_attention_contamination",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n
  FROM documents
),
placed AS (
  SELECT doc_id, n,
         CAST(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - n AS BIGINT) AS s
  FROM tok WHERE n > 0
),
spans AS (
  SELECT doc_id, w,
         LEAST(s + n, (w + 1) * 2048) - GREATEST(s, w * 2048) AS c
  FROM placed,
       LATERAL (SELECT unnest(generate_series(s // 2048, (s + n - 1) // 2048)) AS w)
),
win AS (
  SELECT w,
         CAST(SUM(c) AS BIGINT) AS tot,
         CAST(SUM(c * c) AS BIGINT) AS sumsq,
         COUNT(*) AS n_docs
  FROM spans GROUP BY w
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pure_windows,
       CAST(SUM(tot) AS BIGINT) AS total_tokens,
       CAST(SUM((tot * tot - sumsq) // 2) AS BIGINT) AS cross_pairs,
       CAST(SUM((tot * (tot - 1)) // 2) AS BIGINT) AS total_pairs,
       CAST((CAST(SUM((tot * tot - sumsq) // 2) AS BIGINT) * 1000000)
            // CAST(SUM((tot * (tot - 1)) // 2) AS BIGINT) AS BIGINT) AS cross_ppm
FROM win
""",
)
def q_pack_attention_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-contamination audit of naive concat-and-chunk packing
    (Krell et al. 2021): when documents are concatenated into 2048-
    token windows without attention masks, every token pair from
    DIFFERENT documents inside a window is contaminated attention.
    Using q_sequence_packing's exact placement (cumsum over doc_id
    order), each document's token span intersects its covering
    windows; per window the cross-document pair count is
    (S^2 - sum_d c_d^2) / 2.  The report — window count, pure-window
    share, contaminated pairs and their ppm of the attention budget —
    is what decides whether a run needs boundary-respecting masks or
    can ship with naive packing.

    Determinism: placement, span intersection, and pair counts are
    pure integer arithmetic (tot^2 - sumsq is always even; ppm is
    floor division).

    Scale shape: one running-total window (per-shard at 100 TB, the
    q_sequence_packing note), a tiny explode (a doc covers
    ~len/2048 + 1 windows), and a map-side-combinable window
    aggregate; output is one telemetry row."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.expr("size(filter(split(lower(text), ' '), x -> x != ''))").alias("n"),
    ).where(F.col("n") > 0)
    w_cum = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    placed = tok.select(
        "doc_id", "n", (F.sum("n").over(w_cum) - F.col("n")).alias("s")
    )
    spans = placed.select(
        "doc_id",
        F.explode(
            F.expr("sequence(s div 2048, (s + n - 1) div 2048)")
        ).alias("w"),
        "s",
        "n",
    ).select(
        "doc_id",
        "w",
        F.expr(
            "least(s + n, (w + 1) * 2048) - greatest(s, w * 2048)"
        ).alias("c"),
    )
    win = spans.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return win.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pure_windows"),
        F.sum("tot").cast("bigint").alias("total_tokens"),
        F.sum(F.expr("(tot * tot - sumsq) div 2")).cast("bigint").alias("cross_pairs"),
        F.sum(F.expr("(tot * (tot - 1)) div 2")).cast("bigint").alias("total_pairs"),
        F.expr(
            "cast((sum((tot * tot - sumsq) div 2) * 1000000) "
            "div sum((tot * (tot - 1)) div 2) as bigint)"
        ).alias("cross_ppm"),
    )


@register(
    "q_batch_padding_waste",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS n
  FROM documents
  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0
),
arrival AS (
  SELECT n, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 16 AS b FROM tok
),
bylen AS (
  SELECT n, (ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1) // 16 AS b FROM tok
),
aagg AS (
  SELECT b, CAST(COUNT(*) * MAX(n) - SUM(n) AS BIGINT) AS pad,
         CAST(COUNT(*) * MAX(n) AS BIGINT) AS slot
  FROM arrival GROUP BY b
),
lagg AS (
  SELECT b, CAST(COUNT(*) * MAX(n) - SUM(n) AS BIGINT) AS pad,
         CAST(COUNT(*) * MAX(n) AS BIGINT) AS slot
  FROM bylen GROUP BY b
)
SELECT 'arrival' AS ordering, CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(pad) AS BIGINT) AS padded_tokens,
       CAST(SUM(slot) AS BIGINT) AS slot_tokens,
       CAST((SUM(pad) * 1000000) // SUM(slot) AS BIGINT) AS pad_ppm
FROM aagg
UNION ALL
SELECT 'bylength', CAST(COUNT(*) AS BIGINT), CAST(SUM(pad) AS BIGINT),
       CAST(SUM(slot) AS BIGINT),
       CAST((SUM(pad) * 1000000) // SUM(slot) AS BIGINT)
FROM lagg
""",
)
def q_batch_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching, measured — the inference/eval-serving
    twin of the packing audits: padding a 16-doc batch to its longest
    member wastes (B*max - sum) token slots, and sorting by length
    before batching collapses that waste (the dynamic-batching /
    bucketing trick every serving stack and eval harness uses).  The
    report prices both orderings in integer token slots and ppm, so
    the decision (is length-sorting worth the ordering constraint?)
    is read off the corpus instead of assumed.

    Determinism: batch cuts are row_number over (key, doc_id) floor-
    divided; waste is exact integer arithmetic; ppm is floor division.

    Scale shape: like q_zorder_layout, the global orders here are
    repartitionByRange total sorts at 100 TB (per-shard batching in
    practice — same expression with a partitionBy); the report is two
    window passes and two tiny aggregates."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.expr(
            "cast(size(filter(split(lower(text), ' '), x -> x != '')) as bigint)"
        ).alias("n"),
    ).where(F.col("n") > 0)
    tok = persist_tracked(tok)

    def _waste(order_cols, label: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        batches = tok.select(
            "n", ((F.row_number().over(w) - 1) / 16).cast("bigint").alias("b")
        )
        agg = batches.groupBy("b").agg(
            (F.count(F.lit(1)) * F.max("n") - F.sum("n")).alias("pad"),
            (F.count(F.lit(1)) * F.max("n")).alias("slot"),
        )
        return agg.agg(
            F.lit(label).alias("ordering"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("pad").cast("bigint").alias("padded_tokens"),
            F.sum("slot").cast("bigint").alias("slot_tokens"),
            F.expr(
                "cast((sum(pad) * 1000000) div sum(slot) as bigint)"
            ).alias("pad_ppm"),
        )

    return _waste(["doc_id"], "arrival").unionByName(_waste(["n", "doc_id"], "bylength"))


@register(
    "q_prefix_cache_share",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
tot AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS total_tokens FROM tok),
tiers AS (SELECT unnest([4, 8, 16]) AS L),
pref AS (
  SELECT ti.L, md5(array_to_string(t[1:ti.L], ' ')) AS p
  FROM tok, tiers ti WHERE len(t) >= ti.L
),
grp AS (
  SELECT L, p, COUNT(*) AS g FROM pref GROUP BY L, p
)
SELECT g.L AS prefix_len,
       CAST(SUM(g.g) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_prefixes,
       CAST(SUM(CASE WHEN g.g > 1 THEN g.g ELSE 0 END) AS BIGINT) AS n_shared_docs,
       CAST(SUM((g.g - 1) * g.L) AS BIGINT) AS cacheable_tokens,
       CAST((SUM((g.g - 1) * g.L) * 1000000) // MAX(t.total_tokens) AS BIGINT)
         AS cache_ppm
FROM grp g CROSS JOIN tot t
GROUP BY g.L
""",
)
def q_prefix_cache_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-cache sharing report — the prefill-dedup number behind
    radix/prefix KV caching (vLLM's automatic prefix caching): for
    prefix depths 4/8/16 tokens, how many documents share an exact
    token prefix with another, and how many prefill token-computations
    a prefix cache would save ((g-1)*L per group of g sharers), as
    integer counts and ppm of the corpus' total tokens.  Rising
    cache_ppm at depth 16 means templated/boilerplate openings —
    a serving-cost lever AND a curation smell worth both readings.

    Determinism: prefixes compare by md5 of the joined tokens;
    every output is an integer (ppm is floor division).

    Scale shape: one map-side prefix hash per tier (the tier frame is
    a 3-row literal), a 16-byte-key groupBy with map-side combine,
    and a per-tier aggregate — the corpus text never shuffles."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.expr(_Q_TOKENS).alias("t"))
    tok = persist_tracked(tok)  # read by the totals AND the tier explode
    tot = tok.agg(F.sum(F.size("t")).cast("bigint").alias("total_tokens"))
    tiers = spark.range(1).selectExpr("explode(array(4, 8, 16)) AS L")
    pref = (
        tok.crossJoin(F.broadcast(tiers))
        .where(F.size("t") >= F.col("L"))
        .select("L", F.md5(F.expr("concat_ws(' ', slice(t, 1, L))")).alias("p"))
    )
    grp = pref.groupBy("L", "p").agg(F.count(F.lit(1)).alias("g"))
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("L")
        .agg(
            F.sum("g").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_prefixes"),
            F.sum(F.when(F.col("g") > 1, F.col("g")).otherwise(0))
            .cast("bigint")
            .alias("n_shared_docs"),
            F.sum((F.col("g") - 1) * F.col("L")).cast("bigint").alias(
                "cacheable_tokens"
            ),
            F.expr(
                "cast((sum((g - 1) * L) * 1000000) div max(total_tokens) as bigint)"
            ).alias("cache_ppm"),
        )
        .withColumnRenamed("L", "prefix_len")
    )
