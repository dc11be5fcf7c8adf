"""Text-analysis operators over the ``documents`` corpus (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).

All hot-path expressions are built-in column functions (split / transform /
filter / md5 / regexp) — JVM-side, whole-stage-codegen'd, no Python UDFs —
so they vectorize at 100 TB. Oracle parity: DuckDB list lambdas mirror the
Spark higher-order functions one-to-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Whitespace tokens + a BPE-ish regex token stream (word pieces vs punctuation).
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@query(
    "q20_text_stats_by_lang",
    oracle="""
SELECT lang,
       count(*)                                        AS n_docs,
       round(avg(n_chars), 4)                          AS avg_chars,
       round(avg(len(string_split(text, ' '))), 4)     AS avg_tokens,
       max(len(string_split(text, ' ')))               AS max_tokens,
       min(length(text))                               AS min_len
FROM documents
GROUP BY lang
""",
)
def q20_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (tokenize → aggregate)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(toks)), 4).alias("avg_tokens"),
        F.max(F.size(toks)).cast("bigint").alias("max_tokens"),
        F.min(F.length("text")).cast("bigint").alias("min_len"),
    )


@query(
    "q21_quality_scores",
    oracle=f"""
SELECT doc_id,
       n_tokens,
       round(avg_word_len, 4)      AS avg_word_len,
       round(stopword_ratio, 4)    AS stopword_ratio,
       round(distinct_ratio, 4)    AS distinct_ratio,
       CASE WHEN n_tokens >= 10 AND stopword_ratio < 0.5 AND distinct_ratio > 0.2
            THEN 1 ELSE 0 END      AS quality_keep
FROM (
  SELECT doc_id,
         len(toks)                                                       AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)      AS avg_word_len,
         CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE)
           / len(toks)                                                   AS stopword_ratio,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)            AS distinct_ratio
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
)
""",
)
def q21_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (Gopher/C4-style length + stopword +
    repetition heuristics) as pure column expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", "text", toks.alias("toks"))
    n_tokens = F.size("toks")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stopword_cnt = F.size(F.expr(
        "filter(toks, t -> array_contains(array({}), t))".format(_STOP_SQL)
    ))
    avg_word_len = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    stopword_ratio = stopword_cnt.cast("double") / n_tokens
    distinct_ratio = F.size(F.array_distinct("toks")).cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.when(
            (n_tokens >= 10) & (stopword_ratio < 0.5) & (distinct_ratio > 0.2), 1
        )
        .otherwise(0)
        .alias("quality_keep"),
    )


@query(
    "q152_repetition_metrics",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
g AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT)                 AS n_toks,
         CAST(len(list_distinct(toks)) AS BIGINT)  AS n_distinct,
         CAST(len(toks) - 1 AS BIGINT)             AS n_2g,
         CAST(len(toks) - 2 AS BIGINT)             AS n_3g,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+1], ' '))  AS g2,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))  AS g3
  FROM t
),
m AS (
  SELECT doc_id, n_toks, n_distinct, n_2g, n_3g,
         CAST(list_max(list_transform(list_distinct(g2),
              x -> len(list_filter(g2, y -> y = x)))) AS BIGINT) AS top2_cnt,
         CAST(len(list_filter(g3,
              x -> len(list_filter(g3, y -> y = x)) > 1)) AS BIGINT) AS dup3_cnt
  FROM g
)
SELECT doc_id, n_toks, n_distinct, top2_cnt, dup3_cnt,
       (top2_cnt * 20000 + n_2g) // (n_2g * 2) / 10000.0 AS top2_frac,
       (dup3_cnt * 20000 + n_3g) // (n_3g * 2) / 10000.0 AS dup3_frac,
       CASE WHEN top2_cnt * 100 > n_2g * 18 OR dup3_cnt * 100 > n_3g * 30
            THEN 1 ELSE 0 END AS repetitive
FROM m
""",
)
def q152_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021,
    table A1 — token-count variants): most-frequent-2-gram fraction,
    duplicated-3-gram fraction, distinct-token count. All metrics are
    array-local higher-order functions — zero shuffle, whole-stage codegen.
    The nested filter scan is O(n²) per doc; fine for web-scale docs (~1k
    tokens → ~1e6 cheap JVM comparisons), and the posexplode + groupBy(doc,
    gram) rewrite is the documented alternative for book-length outliers.
    Fractions use floor-scaled integer division (hash-stable across
    engines); the flag thresholds are exact integer comparisons."""
    d = load(spark, sf_dir, "documents")
    d = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    d = d.where(F.size("toks") >= 3).select(
        "doc_id",
        "toks",
        # greatest(…, 0): total under project/filter reordering — 3-arg
        # sequence(1, -k, 1) errors for docs shorter than the gram width
        F.expr(
            "transform(sequence(1, greatest(size(toks) - 1, 0), 1), "
            "i -> concat_ws(' ', slice(toks, i, 2)))"
        ).alias("g2"),
        F.expr(
            "transform(sequence(1, greatest(size(toks) - 2, 0), 1), "
            "i -> concat_ws(' ', slice(toks, i, 3)))"
        ).alias("g3"),
    )
    d = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        (F.size("toks") - 1).cast("bigint").alias("n_2g"),
        (F.size("toks") - 2).cast("bigint").alias("n_3g"),
        F.expr(
            "array_max(transform(array_distinct(g2), "
            "x -> size(filter(g2, y -> y = x))))"
        ).cast("bigint").alias("top2_cnt"),
        F.expr(
            "size(filter(g3, x -> size(filter(g3, y -> y = x)) > 1))"
        ).cast("bigint").alias("dup3_cnt"),
    )
    top2, dup3 = F.col("top2_cnt"), F.col("dup3_cnt")
    n2, n3 = F.col("n_2g"), F.col("n_3g")
    return d.select(
        "doc_id", "n_toks", "n_distinct", "top2_cnt", "dup3_cnt",
        (F.floor((top2 * 20000 + n2) / (n2 * 2)) / 10000.0).alias("top2_frac"),
        (F.floor((dup3 * 20000 + n3) / (n3 * 2)) / 10000.0).alias("dup3_frac"),
        F.when((top2 * 100 > n2 * 18) | (dup3 * 100 > n3 * 30), 1)
        .otherwise(0)
        .alias("repetitive"),
    )


@query(
    "q22_exact_dedup",
    oracle="""
SELECT lang,
       count(*)                  AS n_docs,
       count(DISTINCT md5(text)) AS n_unique,
       count(*) - count(DISTINCT md5(text)) AS n_dups
FROM documents
GROUP BY lang
""",
)
def q22_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication by content hash — at 100 TB the hash-groupBy
    shuffles 16-byte digests instead of full documents. ``dedup_exact``
    below returns the surviving rows; this query reports the per-language
    dedup profile (oracle-checkable)."""
    d = load(spark, sf_dir, "documents")
    h = F.md5("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_dups"),
    )


def dedup_exact(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key row per distinct content hash (deterministic
    survivor choice — ``dropDuplicates`` picks an arbitrary row, which breaks
    replay/audit)."""
    return (
        df.withColumn("_h", F.md5(F.col(text_col)))
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_h").orderBy(F.col(key_col))),
        )
        .where(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


@query(
    "q23_token_counts",
    oracle=f"""
SELECT source,
       sum(len(string_split_regex(trim(text), '\\s+')))      AS ws_tokens,
       sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS bpe_ish_tokens,
       round(avg(len(regexp_extract_all(text, '[a-zA-Z]+'))), 4) AS avg_word_tokens
FROM documents
GROUP BY source
""",
)
def q23_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex token
    stream (letters / digits / single punctuation) — the unit a training-data
    pipeline budgets by."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("ws_tokens"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))).alias(
            "bpe_ish_tokens"
        ),
        F.round(
            F.avg(F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+"), 0))), 4
        ).alias("avg_word_tokens"),
    )


@query(
    "q24_doc_fingerprints",
    oracle="""
SELECT doc_id,
       list_min(list_transform(
         generate_series(1, len(string_split(text, ' ')) - 4),
         i -> md5(array_to_string(string_split(text, ' ')[i:i+4], ' '))
       ))                        AS fingerprint,
       len(string_split(text, ' ')) - 4 AS n_shingles
FROM documents
WHERE len(string_split(text, ' ')) >= 5
""",
)
def q24_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash over rolling word 5-gram shingles
    (winnowing-style content signature; md5 is uniform so the lexicographic
    min over hex digests is a valid min-wise sketch — and engine-independent,
    hence oracle-checkable)."""
    d = load(spark, sf_dir, "documents")
    d = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    shingle_hashes = F.expr(
        # step 1: sequence(1, 0) descends; (1, 0, 1) is empty
        "transform(sequence(1, size(toks) - 4, 1), i -> md5(concat_ws(' ', slice(toks, i, 5))))"
    )
    return d.where(F.size("toks") >= 5).select(
        "doc_id",
        F.array_min(shingle_hashes).alias("fingerprint"),
        (F.size("toks") - 4).cast("bigint").alias("n_shingles"),
    )


@query(
    "q25_language_id",
    oracle="""
WITH grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           generate_series(1, greatest(length(text) - 2, 1)),
           i -> substring(text, i, 3))) AS gram
  FROM documents
),
prof AS (
  SELECT lang AS profile_lang, gram FROM (
    SELECT lang, gram,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, gram) AS rk
    FROM grams WHERE doc_id % 2 = 0 GROUP BY lang, gram
  ) WHERE rk <= 40
),
dedup AS (SELECT DISTINCT doc_id, lang, gram FROM grams WHERE doc_id % 2 = 1),
scored AS (
  SELECT d.doc_id, d.lang, p.profile_lang, count(*) AS overlap
  FROM dedup d JOIN prof p ON d.gram = p.gram
  GROUP BY d.doc_id, d.lang, p.profile_lang
)
SELECT doc_id, lang AS true_lang, profile_lang AS predicted_lang, overlap
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY overlap DESC, profile_lang) AS rk
      FROM scored)
WHERE rk = 1
""",
)
def q25_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID, fully oracle-backed (promoted in r3:
    the heuristic is deterministic windowed SQL, not iterative — train/score
    split by doc_id parity, top-40 trigram profile, overlap argmax with
    lexicographic tie-breaks in both dialects).

    Build a per-language profile = top character-trigrams by frequency from a
    labelled sample, then classify each document by profile overlap. At scale
    the profile is tiny → broadcast join; the document side is one pass.
    """
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))")
        ).alias("gram"),
    )
    # Profile: top 40 trigrams per language from even doc_ids (the "training" half).
    prof = (
        grams.where(F.col("doc_id") % 2 == 0)
        .groupBy("lang", "gram")
        .count()
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("lang").orderBy(F.col("count").desc(), "gram")),
        )
        .where(F.col("rk") <= 40)
        .select(F.col("lang").alias("profile_lang"), "gram")
    )
    scored = (
        grams.where(F.col("doc_id") % 2 == 1)
        .dropDuplicates(["doc_id", "gram"])
        .join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("overlap").desc(), "profile_lang")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.col("profile_lang").alias("predicted_lang"),
            "overlap",
        )
        .orderBy("doc_id")
    )


@query(
    "q29_tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id < 100
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
tot AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok)
SELECT doc_id, token, tf,
       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
       rk
FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df, tot.n_docs,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(CAST(tot.n_docs AS DOUBLE) / df.df) DESC, tf.token
         ) AS rk
  FROM tf JOIN df USING (token) CROSS JOIN tot
)
WHERE rk <= 3
""",
)
def q29_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, the classic text-relevance score, as a pure DataFrame plan:
    explode → tf (hash agg) → df (hash agg) → broadcast-join df + N → window
    top-3 per doc. The document-frequency table is vocabulary-sized → always
    broadcast; only the token explode shuffles."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = tok.select("doc_id").distinct().count()  # scalar; bounded by corpus size
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "tfidf_raw", F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            "token",
            "tf",
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


@query(
    "q45_doc_zscores",
    oracle="""
SELECT doc_id,
       lang,
       round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
             / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS z_chars
FROM documents
""",
)
def q45_doc_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped transform via applyInPandas (the Arrow-batched escape
    hatch for semantics Spark lacks): per-language z-score of document
    length. Deliberately oracle-checked against plain window SQL to prove the
    Pandas path computes exactly what the declarative path would — the
    pattern to copy for genuinely non-SQL group transforms.

    Scale: one shuffle on the grouping key; each group must fit in one
    worker's memory (fine for per-language stats; use window functions when
    groups can be huge)."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)  # sample stddev = stddev_samp
        out = pdf[["doc_id", "lang"]].copy()
        out["z_chars"] = ((pdf["n_chars"] - mu) / sd).round(4)
        return out

    return d.groupBy("lang").applyInPandas(
        zscore, "doc_id bigint, lang string, z_chars double"
    )


@query(
    "q55_deterministic_splits",
    oracle="""
WITH assigned AS (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS bucket
  FROM documents
)
SELECT lang,
       count(*)                                    AS n_docs,
       count(*) FILTER (WHERE bucket <= 7)         AS n_train,
       count(*) FILTER (WHERE bucket = 8)          AS n_val,
       count(*) FILTER (WHERE bucket = 9)          AS n_test
FROM assigned
GROUP BY lang
""",
)
def q55_deterministic_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) — the
    reproducible-sampling pattern for training pipelines: membership is a
    pure function of the stable key (md5 mod), so the split survives
    re-runs, engine changes, and data re-partitioning — unlike
    rand()/TABLESAMPLE, which are nondeterministic under retry. Same
    expression evaluates in DuckDB, which is exactly the point."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    a = d.select("lang", bucket.alias("bucket"))
    return a.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("bucket") <= 7, 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("bucket") == 8, 1).otherwise(0)).alias("n_val"),
        F.sum(F.when(F.col("bucket") == 9, 1).otherwise(0)).alias("n_test"),
    )


@query(
    "q58_text_cleaning",
    oracle="""
SELECT doc_id,
       length(cleaned)                          AS clean_len,
       len(string_split(cleaned, ' '))          AS clean_tokens,
       substr(cleaned, 1, 20)                   AS clean_prefix
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS cleaned
  FROM documents
  WHERE doc_id < 200
)
""",
)
def q58_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the first stage of every training-data pipeline:
    lowercase → strip non-alphanumerics → collapse whitespace → trim, all as
    codegen'd regexp expressions (one projection, no UDF, no shuffle)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(cleaned).cast("bigint").alias("clean_len"),
        F.size(F.split(cleaned, " ")).cast("bigint").alias("clean_tokens"),
        F.substring(cleaned, 1, 20).alias("clean_prefix"),
    )


BM25_TERMS = ("customer", "join", "hash")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "q95_bm25_scores",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM tok WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term
),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
c AS (
  SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
)
SELECT doc_id,
       round(sum(
         ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         * tf * ({BM25_K1} + 1)
         / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
       ), 4) AS bm25
FROM tf JOIN dft USING (term), c
GROUP BY doc_id
""",
)
def q95_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set —
    the retrieval-scoring step of a data-curation pipeline (rank corpus
    documents against a probe query), built from the same tf/df statistics
    as q29's TF-IDF.

    Scale: one explode→filter→count pass for term frequencies (the filter
    cuts the exploded stream to query terms BEFORE the shuffle), a tiny
    per-term document-frequency table (broadcast), and a scalar stats row
    (broadcast) — the corpus-sized shuffle is the single tf aggregation."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    ).where(F.col("term").isin(*BM25_TERMS))
    tf = tok.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    consts = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    idf = F.log(F.lit(1) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = (
        F.col("tf")
        * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * w), 4).alias("bm25"))
    )


@query(
    "q109_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tot AS (
  SELECT (SELECT count(*) FROM tok) AS n,
         (SELECT count(*) FROM cnt) AS v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln((c + 1.0) / (n + v))), 4) AS avg_neg_logprob
FROM tok JOIN cnt USING (term), tot
GROUP BY doc_id
""",
)
def q109_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring: average negative log-probability of
    each document under the corpus's own add-1-smoothed unigram model — the
    simplest 'perplexity filter' of a training-data pipeline (high score =
    unusual token mix = candidate for review).

    Scale: the model is a (term, count) table — bounded by vocabulary, so it
    BROADCASTS; scoring is one exploded pass over the corpus joined against
    the broadcast model, one aggregation back to doc grain. The corpus never
    self-joins."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("n"), F.count(F.lit(1)).cast("bigint").alias("v")
    )
    neg_lp = -F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v")))
    return (
        tok.join(F.broadcast(cnt), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(neg_lp), 4).alias("avg_neg_logprob"),
        )
    )


def compression_ratios(docs: DataFrame) -> DataFrame:
    """Compression-ratio kernel: (doc_id, raw_bytes, compression_ratio,
    comp_bounded, comp_subadditive) per document — zlib-compressed size over
    raw size, the cheap repetition detector real curation pipelines run
    (boilerplate and template spam compress far better than natural text;
    complements q76's token-level repetition score).

    The two int flags are deterministic zlib contracts (used by the q115
    oracle promotion):
    - comp_bounded: compressed size within zlib's published worst-case
      envelope (raw + raw/1000 + 64 — compressBound-shaped);
    - comp_subadditive: compressing text+text beats 2× compressing text
      (repetition must help; trivially true for empty text).

    Scale: mapInPandas with per-batch byte work — CPU-bound, no shuffle at
    all until the final projection; ratios are computed where the text
    already lives."""
    import pandas as pd

    def ratios(batches):
        import zlib

        for pdf in batches:
            # null text → empty (str.encode yields NaN for nulls, which
            # crashes zlib.compress); empty text → denominator clamped to 1
            # so the ratio is finite (= compressed header size, flagged
            # "compresses suspiciously well", not inf)
            raw = pdf["text"].fillna("").str.encode("utf-8")
            raw_len = raw.map(len).astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            comp2 = raw.map(lambda b: len(zlib.compress(b + b, 6)))
            bound = raw_len + raw_len // 1000 + 64
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": raw_len,
                    "compression_ratio": (comp / raw_len.clip(lower=1)).round(4),
                    "comp_bounded": (comp <= bound).astype("int32"),
                    "comp_subadditive": (
                        (raw_len == 0) | (comp2 < 2 * comp)
                    ).astype("int32"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        ratios,
        "doc_id bigint, raw_bytes bigint, compression_ratio double, "
        "comp_bounded int, comp_subadditive int",
    )


@query(
    "q115_compression_ratio",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS raw_bytes,
       1 AS comp_bounded,
       1 AS comp_subadditive
FROM documents
""",
)
def q115_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio signal, promoted to a full oracle (r4,
    derived-bound-flag pattern): the float ratio has no ANSI twin, so the
    hashed output is the EXACT per-doc byte count (octet_length of the utf-8
    encoding, which DuckDB recomputes) plus two deterministic zlib-behavior
    flags the oracle asserts as literal 1 (worst-case size envelope,
    repetition subadditivity — see compression_ratios). The ratio itself
    stays available via the kernel and is pinned by ordering tests."""
    return compression_ratios(load(spark, sf_dir, "documents")).drop(
        "compression_ratio"
    )


# ------------------------------------------------------------------- BPE

N_BPE_MERGES = 6


def _bpe_oracle_sql(n_merges: int = N_BPE_MERGES) -> str:
    """Unrolled n-step DuckDB twin of the BPE merge loop (the q101
    fixed-point-CTE pattern): every step recomputes pair counts over the
    word-frequency table, picks argmax with the same (count DESC, pair ASC)
    tie-break, and applies the same greedy left-to-right delimited-string
    replace. All-integer counts + exact strings → hash-stable."""
    sql = """
WITH w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents
  ) WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word
),
d0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(.)', chr(31)||'\\1'||chr(31), 'g') AS d, cnt FROM w0
)"""
    for i in range(1, n_merges + 1):
        p, b_, dprev, dcur = f"p{i}", f"b{i}", f"d{i-1}", f"d{i}"
        # MATERIALIZED: DuckDB inlines plain CTEs, so without it each
        # d_i's three scalar-subquery references to b_i re-expand the whole
        # chain — exponential re-evaluation across the unrolled steps
        sql += f""",
{p} AS MATERIALIZED (
  SELECT u.p[1] AS a, u.p[2] AS b, CAST(sum(cnt) AS BIGINT) AS pc
  FROM (SELECT string_split(trim(d, chr(31)), chr(31)||chr(31)) AS syms, cnt
        FROM {dprev}) t,
       unnest(list_zip(syms[:-2], syms[2:])) u(p)
  GROUP BY 1, 2
),
{b_} AS MATERIALIZED (SELECT a, b, pc FROM {p} ORDER BY pc DESC, a, b LIMIT 1),
{dcur} AS MATERIALIZED (
  SELECT replace(d,
                 chr(31)||(SELECT a FROM {b_})||chr(31)||chr(31)||(SELECT b FROM {b_})||chr(31),
                 chr(31)||(SELECT a FROM {b_})||(SELECT b FROM {b_})||chr(31)) AS d,
         cnt
  FROM {dprev}
)"""
    selects = [
        f"SELECT {i} AS step, a AS left_sym, b AS right_sym, a||b AS merged, "
        f"pc AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(selects)



def _bpe_learn(spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES):
    """Shared BPE merge loop (see q136 docstring for semantics + scale
    notes): returns (final delimited-symbol state DataFrame, merge list of
    (step, a, b, merged, pair_count)). ``n_merges`` scales the vocabulary —
    the gate uses N_BPE_MERGES; tests drive larger counts against the
    parameterized oracle generator."""
    from ..registry import track_persist

    sep = F.lit("\x1f")
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    state = track_persist(
        words.select(
            F.expr(r"regexp_replace(word, '(.)', concat(char(31), '$1', char(31)))").alias("d"),
            "cnt",
        )
    )
    merges = []
    for step in range(1, n_merges + 1):
        syms = F.expr("split(trim(BOTH char(31) FROM d), concat(char(31), char(31)))")
        top = (
            state.select(syms.alias("syms"), "cnt")
            .where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                    )
                ).alias("p"),
                "cnt",
            )
            .select(F.col("p.l").alias("a"), F.col("p.r").alias("b"), "cnt")
            .groupBy("a", "b")
            .agg(F.sum("cnt").cast("bigint").alias("pc"))
            .orderBy(F.col("pc").desc(), "a", "b")
            .limit(1)
            .collect()  # bounded: ONE row — the global argmax driver hop
        )
        if not top:
            break
        a, b, pc = top[0]["a"], top[0]["b"], top[0]["pc"]
        merges.append((step, a, b, a + b, pc))
        find = F.concat(sep, F.lit(a), sep, sep, F.lit(b), sep)
        repl = F.concat(sep, F.lit(a + b), sep)
        state = state.select(F.replace(F.col("d"), find, repl).alias("d"), "cnt")
    return state, merges


@query("q136_bpe_merges", oracle=_bpe_oracle_sql())
def q136_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning — the classic subword-tokenizer
    training loop, run on the word-FREQUENCY table (the standard algorithm:
    pair statistics weight by word count, so the corpus is touched once).

    Per merge step: adjacent-symbol pair counts are a keyed hash aggregation
    over the distinct-word table; the argmax is ONE row to the driver (a
    global top-1 reduce — the only driver round-trip, by construction of the
    algorithm); the merge itself is a map-side string replace. Symbols live
    in a char(31)-delimited representation where replace()'s left-to-right
    non-overlapping semantics IS BPE's greedy merge order — and DuckDB's
    replace shares those semantics, which is what makes the unrolled-CTE
    oracle exact (ties broken by count DESC, pair ASC in both engines).

    Scale: the state is O(distinct words), not O(corpus); each iteration is
    one shuffle on (a, b) pairs. 100 TB posture: identical loop, with the
    word table as a persisted lakehouse table. (SURVEY §2.2 text-analysis
    row; the token-counting tier's natural next step.)"""
    _state, merges = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merged string, pair_count bigint"
    )


def _bpe_token_oracle_sql(n_merges: int = N_BPE_MERGES) -> str:
    """Token histogram after applying the learned merges: the q136 CTE chain
    plus one explode of the final symbol state, weighted by word count."""
    base = _bpe_oracle_sql(n_merges)
    # reuse the full chain, replace the final SELECT with the tokenization
    head = base[: base.rindex("\nSELECT 1 AS step")]
    return head + f"""
SELECT token, CAST(sum(cnt) AS BIGINT) AS tok_count
FROM (SELECT unnest(string_split(trim(d, chr(31)), chr(31)||chr(31))) AS token, cnt
      FROM d{n_merges})
GROUP BY token
"""


@query("q137_bpe_token_counts", oracle=_bpe_token_oracle_sql())
def q137_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of BPE: apply the q136-learned merge table to the
    corpus (the same replace chain, now with a FIXED merge list) and emit
    the corpus-wide token histogram — the tokenizer-frequency audit a
    pretraining pipeline keeps next to its vocab. Shares q136's loop, so
    learned merges and applied merges can never drift apart."""
    state, _merges = _bpe_learn(spark, sf_dir)
    syms = F.expr("split(trim(BOTH char(31) FROM d), concat(char(31), char(31)))")
    return (
        state.select(F.explode(syms).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("tok_count"))
    )


@query(
    "q167_dsir_importance",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
langs AS (SELECT doc_id, lang FROM documents),
lt AS (SELECT t.doc_id, t.term, l.lang FROM tok t JOIN langs l USING (doc_id)),
tgt AS (SELECT term, count(*) AS ct FROM lt WHERE lang = 'en' GROUP BY term),
src AS (SELECT term, count(*) AS cs FROM lt WHERE lang <> 'en' GROUP BY term),
tot AS (
  SELECT (SELECT count(*) FROM lt WHERE lang = 'en') AS nt,
         (SELECT count(*) FROM lt WHERE lang <> 'en') AS ns,
         (SELECT count(DISTINCT term) FROM tok) AS v
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln((coalesce(g.ct, 0) + 1.0) / (tot.nt + tot.v))
                 - ln((coalesce(s.cs, 0) + 1.0) / (tot.ns + tot.v))), 4)
         AS dsir_logratio,
       CAST(CASE WHEN avg(ln((coalesce(g.ct, 0) + 1.0) / (tot.nt + tot.v))
                         - ln((coalesce(s.cs, 0) + 1.0) / (tot.ns + tot.v))) > 0
                 THEN 1 ELSE 0 END AS INT) AS target_like
FROM tok t
LEFT JOIN tgt g USING (term)
LEFT JOIN src s USING (term), tot
GROUP BY t.doc_id
""",
)
def q167_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, Data Selection with
    Importance Resampling): score every document by the mean per-token log
    importance ratio ln(p_target/p_source) between two add-1-smoothed
    hashed-unigram models — target = the 'en' slice, source = everything
    else. Documents with positive mean ratio look target-like and survive
    selection (``target_like``); the continuous score drives weighted
    resampling in the full recipe.

    Scale: both n-gram models are vocabulary-bounded (term, count) tables →
    BROADCAST; scoring is one exploded pass over the corpus with two
    broadcast left joins and one aggregation back to doc grain. No corpus
    self-join, no shuffle beyond the final doc-grain aggregation —
    identical shape at 100 TB."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
    tgt = (
        tok.where(F.col("lang") == "en")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    src = (
        tok.where(F.col("lang") != "en")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    tot = tok.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).cast("bigint").alias("ns"),
        F.countDistinct("term").cast("bigint").alias("v"),
    )
    ratio = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + F.col("v"))
    ) - F.log((F.coalesce(F.col("cs"), F.lit(0)) + 1.0) / (F.col("ns") + F.col("v")))
    return (
        tok.join(F.broadcast(tgt), "term", "left")
        .join(F.broadcast(src), "term", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(ratio), 4).alias("dsir_logratio"),
            (F.avg(ratio) > 0).cast("int").alias("target_like"),
        )
    )
