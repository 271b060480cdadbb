"""Text-analysis operators for training-data pipelines over `documents`:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All JVM-side (pyspark.sql.functions / SQL expressions) —
no Python in the hot path; each paired with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.analytics import load

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "der", "die",
             "le", "la", "el", "de", "und", "et", "y"]
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish token regex: letter runs, digit runs, single non-alnum marks.
# Spark SQL string literals eat one backslash level → the Spark variant
# double-escapes \s.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
TOKEN_RE_SPARK = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"


# --------------------------------------------------------------- token count
def q_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '\\\\S+', 0))").alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{TOKEN_RE_SPARK}', 0))").alias("bpe_ish_tokens"),
        F.length("text").alias("n_chars"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS bpe_ish_tokens,
       length(text) AS n_chars
FROM documents
"""


# --------------------------------------------------------------- quality score
def q_text_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    d = (
        d.withColumn("n_words", F.size(words))
        .withColumn(
            "n_stop",
            F.size(F.expr(f"filter(regexp_extract_all(lower(text), '[a-z]+', 0), w -> w in ({_SW_SQL}))")),
        )
        .withColumn("n_punct", F.expr("size(regexp_extract_all(text, '[^A-Za-z0-9\\\\s]', 0))"))
    )
    return d.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_stop") / F.greatest(F.col("n_words"), F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.col("n_punct") / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
        F.when((F.col("n_words") >= 20) & (F.col("n_stop") > 0), F.lit("keep"))
        .when(F.col("n_words") >= 5, F.lit("review"))
        .otherwise(F.lit("drop"))
        .alias("quality_bucket"),
    )


SQL_TEXT_QUALITY = f"""
WITH w AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), w -> w IN ({_SW_SQL}))) AS n_stop,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
  FROM documents
)
SELECT doc_id, n_words,
       round(n_stop / greatest(n_words, 1), 4) AS stopword_ratio,
       round(n_punct / greatest(length(text), 1), 4) AS punct_ratio,
       CASE WHEN n_words >= 20 AND n_stop > 0 THEN 'keep'
            WHEN n_words >= 5 THEN 'review' ELSE 'drop' END AS quality_bucket
FROM w
"""


# --------------------------------------------------------------- language id
def q_lang_id(spark, sf_dir):
    """n-gram/stopword heuristic vs the labeled lang column: agreement counts.
    ascii_ratio >= .99 ∧ english stopwords → 'en-ish'; non-ascii heavy → 'cjk-ish'."""
    d = load(spark, sf_dir, "documents")
    en_sw = "['the','of','and','to','is']"
    d = (
        d.withColumn(
            "ascii_ratio",
            F.length(F.regexp_replace("text", "[^\\x00-\\x7F]", "")) / F.greatest(F.length("text"), F.lit(1)),
        )
        .withColumn(
            "en_hits",
            F.size(F.expr("filter(regexp_extract_all(lower(text), '[a-z]+', 0), w -> w in ('the','of','and','to','is'))")),
        )
        .withColumn(
            "lang_guess",
            F.when(F.col("ascii_ratio") < 0.7, F.lit("cjk-ish"))
            .when(F.col("en_hits") >= 3, F.lit("en-ish"))
            .otherwise(F.lit("euro-other")),
        )
    )
    return d.groupBy("lang", "lang_guess").agg(F.count("*").alias("n"))


SQL_LANG_ID = """
WITH g AS (
  SELECT lang,
         length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) / greatest(length(text), 1) AS ascii_ratio,
         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), w -> w IN ('the','of','and','to','is'))) AS en_hits
  FROM documents
)
SELECT lang,
       CASE WHEN ascii_ratio < 0.7 THEN 'cjk-ish'
            WHEN en_hits >= 3 THEN 'en-ish' ELSE 'euro-other' END AS lang_guess,
       count(*) AS n
FROM g GROUP BY 1, 2
"""


# --------------------------------------------------------------- fingerprint
def q_doc_fingerprint(spark, sf_dir):
    """Normalized-content fingerprint (the reference's spider_extend MongoDB
    pipeline computes simplefp = md5 of cjk-only content, README.md:574-576 —
    same shape: normalize → md5)."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


SQL_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
FROM documents
"""

# ----------------------------------------------------------- training mix
# Per-language keep rates: downsample the dominant language, keep the tail.
# The point of the operator is HOW it samples, not the rates: a hash of the
# row key against a per-stratum threshold. Unlike rand()-based sampling this
# is deterministic across retries, partitionings, and cluster sizes (a
# re-executed task keeps exactly the same rows — required for reproducible
# training mixes), shuffles nothing, and needs no RNG state. Pure map-side
# filter: at 100 TB it is a single scan with the predicate pushed to parquet.
_MIX_CASE = ("CASE lang WHEN 'en' THEN 0.35 WHEN 'zh' THEN 0.8 "
             "WHEN 'es' THEN 0.8 WHEN 'de' THEN 0.8 WHEN 'fr' THEN 0.8 "
             "ELSE 1.0 END")


def q_sample_training_mix(spark, sf_dir):
    """Deterministic stratified sampler: keep doc iff
    u(doc_id) < rate(lang), with u = md5-derived uniform in [0, 1)."""
    d = load(spark, sf_dir, "documents")
    u = ("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
         " as double) / 4294967296.0")
    return d.where(F.expr(f"{u} < {_MIX_CASE}")).select("doc_id", "lang")


SQL_SAMPLE_TRAINING_MIX = f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0
      < {_MIX_CASE}
"""

QUERIES = {
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "sample_training_mix": (q_sample_training_mix, SQL_SAMPLE_TRAINING_MIX),
}
