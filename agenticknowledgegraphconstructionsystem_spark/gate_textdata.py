"""Gate queries for the training-data-pipeline operators (dedup,
similarity, text analysis) over documents/embeddings, with DuckDB oracles.

Exactness techniques:
* jaccard thresholds as integer cross-multiplication (2·inter >= union),
* cosine emitted as CAST(FLOOR(cos·1e9) AS BIGINT) — the double pipeline
  (widen float32→double, ordered fold dot product, IEEE division/sqrt) is
  bit-identical between Spark's `aggregate` fold and DuckDB's
  `list_reduce` fold, so the scaled integer matches exactly,
* all divisions that feed integers go through explicit floor().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import word_ngram_shingles
from .operators.similarity import _dot, _norm
from .operators.textstats import (
    LANG_MARKERS,
    TOKEN_REGEX,
    detect_language,
    fingerprint,
    quality_columns,
    token_counts,
)

_BIG = "bigint"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def q_exact_dup(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").cast(_BIG).alias("keeper"),
            F.count("*").cast(_BIG).alias("n_copies"),
        )
    )


O_EXACT_DUP = """
SELECT md5(text) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs at threshold 1/3, integers only."""
    sh = word_ngram_shingles(_docs(spark, sf_dir), n=3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return j.where(F.col("inter") * 3 >= union).select(
        F.col("id_a").cast(_BIG).alias("id_a"),
        F.col("id_b").cast(_BIG).alias("id_b"),
        F.col("inter").cast(_BIG).alias("inter"),
        F.col("sz_a").cast(_BIG).alias("sz_a"),
        F.col("sz_b").cast(_BIG).alias("sz_b"),
    )


O_NGRAM_JACCARD = """
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM w, unnest(range(1, greatest(len(words) - 2, 1) + 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 3 >= sa.sz + sb.sz - inter"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", detect_language(F.col("text")).alias("detected_lang"))


def _o_lang_scores() -> str:
    parts = []
    for lang, toks in LANG_MARKERS.items():
        occ = " + ".join(
            f"CAST((length(p) - length(replace(p, ' {t} ', ''))) / {len(t) + 2} AS BIGINT)"
            for t in toks
        )
        parts.append(f"({occ}) AS s_{lang}")
    return ", ".join(parts)


O_LANG_ID = f"""
WITH p AS (SELECT doc_id, ' ' || lower(coalesce(text, '')) || ' ' AS p FROM documents),
s AS (SELECT doc_id, {_o_lang_scores()} FROM p)
SELECT doc_id,
       CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
            WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS detected_lang
FROM s"""


def q_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    cols = quality_columns(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


_O_STOPS = " + ".join(
    f"CAST((length(p) - length(replace(p, ' {t} ', ''))) / {len(t) + 2} AS BIGINT)"
    for t in LANG_MARKERS["en"]
)

O_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         lower(coalesce(text, '')) AS lt,
         ' ' || lower(coalesce(text, '')) || ' ' AS p
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(length(t) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split_regex(lt, '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(lt, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(regexp_replace(lt, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
         {_O_STOPS} AS stop_hits
  FROM base
),
m2 AS (
  SELECT *,
         CASE WHEN n_words > 0 THEN CAST(FLOOR(n_alpha * 100 / n_words) AS BIGINT) ELSE 0 END AS mean_word_len_x100,
         CASE WHEN n_chars > 0 THEN CAST(FLOOR(n_alpha * 50 / n_chars) AS BIGINT) ELSE 0 END AS alpha_component,
         LEAST(CAST(20 AS BIGINT), CAST(FLOOR(n_chars / 50) AS BIGINT)) AS len_component
  FROM m
)
SELECT doc_id, n_chars, n_words, n_alpha, n_punct, stop_hits, mean_word_len_x100,
       alpha_component
       + (CASE WHEN mean_word_len_x100 BETWEEN 300 AND 800 THEN 30
               WHEN mean_word_len_x100 >= 200 AND mean_word_len_x100 < 300 THEN 15
               ELSE 0 END)
       + len_component AS quality_pct
FROM m2"""


def q_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    cols = token_counts(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


O_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(coalesce(text,'')), '{TOKEN_REGEX}')) AS BIGINT) AS bpe_tokens
FROM documents"""


def q_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


O_FINGERPRINT = """
SELECT doc_id, md5(trim(regexp_replace(lower(coalesce(text,'')), '\\s+', ' ', 'g'))) AS fp
FROM documents"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for queries vec_id < 5; cosine scaled to
    an exact integer (floor(cos * 1e9))."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            F.col("query_id").cast(_BIG).alias("query_id"),
            F.col("neighbor_id").cast(_BIG).alias("neighbor_id"),
            F.floor(F.col("cosine") * 1e9).cast(_BIG).alias("cos_e9"),
            F.col("rank").cast(_BIG).alias("rank"),
        )
    )


O_ANN_COSINE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2]), (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(c.v, x -> x * x), (acc, x) -> acc + x))) AS cosine
  FROM e q JOIN e c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(FLOOR(cosine * 1e9) AS BIGINT) AS cos_e9, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""


# ---------------------------------------------------------------------------
# rows-only (non-SQL-expressible: hash functions differ across engines)
# ---------------------------------------------------------------------------

def q_minhash_dups(spark, sf_dir):
    from .operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_docs(spark, sf_dir), n=3, threshold=0.3)


def q_simhash_sigs(spark, sf_dir):
    from .operators.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir))


def q_rhp_ann(spark, sf_dir):
    from .operators.similarity import rhp_ann_topk

    emb = _emb(spark, sf_dir)
    return rhp_ann_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


TEXT_QUERIES = {
    "td_exact_dup": q_exact_dup,
    "td_ngram_jaccard": q_ngram_jaccard,
    "td_lang_id": q_lang_id,
    "td_quality": q_quality,
    "td_token_count": q_token_count,
    "td_fingerprint": q_fingerprint,
    "td_ann_cosine_topk": q_ann_cosine_topk,
    "td_minhash_dups": q_minhash_dups,
    "td_simhash_sigs": q_simhash_sigs,
    "td_rhp_ann_topk": q_rhp_ann,
}

TEXT_ORACLES = {
    "td_exact_dup": O_EXACT_DUP,
    "td_ngram_jaccard": O_NGRAM_JACCARD,
    "td_lang_id": O_LANG_ID,
    "td_quality": O_QUALITY,
    "td_token_count": O_TOKEN_COUNT,
    "td_fingerprint": O_FINGERPRINT,
    "td_ann_cosine_topk": O_ANN_COSINE,
    # td_minhash_dups / td_simhash_sigs / td_rhp_ann_topk: engine-specific
    # hashing (xxhash64 seeds / RHP planes) → rows-only checks by design
}
