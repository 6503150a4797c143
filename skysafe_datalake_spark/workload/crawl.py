"""Web-crawl curation operators: link-graph extraction, URL
canonicalization, and hashed-feature quality classification.

These are the crawl-side stages of a pretraining data pipeline
(upstream of the dedup/contamination/quality stages in
``workload/llm_ops.py``): pull the anchor graph out of markup, fold
the many spellings of a URL into one canonical key, and score each
document with a linear classifier over hashed token features — the
fastText-shaped quality gate every large corpus runs, reduced to its
Spark plumbing (feature hashing + weight lookup + margin) with
deterministic weights so a SQL oracle can check every row.

The synthetic documents table has no markup or URLs, so the first
projection of each query synthesizes them deterministically from
(text, source, doc_id) — pinned by the oracle, same trick as
``html_boilerplate_strip``. The operator under test is everything
after that projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.tables import load

# ───────────────────────── link-graph extraction ─────────────────

# Every 7th word becomes an anchor tag pointing at a host derived
# from the word itself, so the corpus yields a small power-law-ish
# host graph (word frequencies are skewed).
_ANCHOR_HTML = """array_join(
  transform(split(text, ' '), (w, i) ->
    CASE WHEN (i + 1) % 7 = 0
         THEN concat('<a href="https://', w, '.example.com/p',
                     CAST((i + 1) % 5 AS STRING), '">', w, '</a>')
         ELSE w END),
  ' ')"""

_LINK_GRAPH_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
html AS (
  SELECT doc_id,
         string_agg(
           CASE WHEN pos % 7 = 0
                THEN '<a href="https://' || w || '.example.com/p'
                     || CAST(pos % 5 AS VARCHAR) || '">' || w || '</a>'
                ELSE w END,
           ' ' ORDER BY pos) AS html
  FROM words GROUP BY doc_id
),
links AS (
  SELECT doc_id,
         unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
  FROM html
)
SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM links
GROUP BY host
"""


@register("link_graph_extract", _LINK_GRAPH_SQL)
def link_graph_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction + host in-degree: regexp_extract_all over the
    markup, one explode, one hash aggregation keyed on host. All three
    steps are whole-stage-codegen JVM expressions; the explode fans out
    ~n_words/7 rows per doc but they carry only (doc_id, url), and the
    host aggregation combines map-side, so the single shuffle moves one
    slim row per (partition, host). Host skew (a hub domain linked from
    everywhere) is absorbed by that partial aggregation — the classic
    reason link-graph extraction is groupBy-shaped, never a self-join.
    """
    docs = load(spark, sf_dir, "documents")
    links = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""regexp_extract_all({_ANCHOR_HTML}, 'href="([^"]+)"', 1)"""
            )
        ).alias("url"),
    )
    return links.select(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host"), "doc_id"
    ).groupBy("host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ───────────────────────── URL canonicalization ──────────────────

# Raw URL synthesized with every non-canonical feature at once:
# uppercase scheme/host, www prefix, explicit default port, tracking
# params around a real one, and a fragment.
_RAW_URL = (
    "concat('HTTPS://WWW.', upper(source), '.Example.COM:443/Docs/',"
    " CAST(doc_id % 7 AS STRING),"
    " '/?utm_source=feed&id=', CAST(doc_id % 13 AS STRING),"
    " '&utm_campaign=x#sec', CAST(doc_id % 3 AS STRING))"
)

_RAW_URL_DUCK = """
  'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/'
  || CAST(doc_id % 7 AS VARCHAR)
  || '/?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR)
  || '&utm_campaign=x#sec' || CAST(doc_id % 3 AS VARCHAR)
"""

_URL_CANON_SQL = f"""
WITH raw AS (
  SELECT doc_id, {_RAW_URL_DUCK} AS url FROM documents
),
step AS (
  SELECT doc_id,
    -- lowercase scheme+authority only (path stays case-sensitive),
    -- then strip: fragment, www., default port, utm_* params (keep
    -- the separator of the FOLLOWING param: drop 'utm_x=y&' pairs
    -- first, then a trailing '[?&]utm_x=y'), and the trailing slash
    -- of a non-root path.
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              lower(regexp_extract(regexp_replace(url, '#.*$', '', 'g'),
                                   '^([^/]*//[^/]+)', 1))
              || regexp_replace(regexp_replace(url, '#.*$', '', 'g'),
                                '^[^/]*//[^/]+', '', 'g'),
              '^(https?://)www\\.', '\\1', 'g'),
            ':443(/|$)', '\\1', 'g'),
          'utm_[^&]*&', '', 'g'),
        '[?&]utm_[^&]*$', '', 'g'),
      '/(\\?|$)', '\\1', 'g') AS canonical_url
  FROM raw
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc_id
FROM step
GROUP BY canonical_url
"""


@register("url_canonicalize", _URL_CANON_SQL)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization as a pure expression chain (zero shuffle
    until the final groupBy): lowercase the scheme+authority while
    preserving path case, strip fragment / www. / default port /
    utm_* tracking params / trailing path slash. Folding the many
    spellings of one resource into a single key is what makes
    crawl-level exact dedup and host-level stats possible — and since
    it's all regexp codegen, at 100 TB it costs one scan plus the
    aggregation shuffle on the canonical key (skew on popular URLs
    handled by map-side combine)."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_RAW_URL)
    no_frag = F.regexp_replace(url, r"#.*$", "")
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, r"^([^/]*//[^/]+)", 1)),
        F.regexp_replace(no_frag, r"^[^/]*//[^/]+", ""),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(lowered, r"^(https?://)www\.", r"$1"),
                r":443(/|$)",
                r"$1",
            ),
            r"utm_[^&]*&",
            "",
        ),
        r"[?&]utm_[^&]*$",
        "",
    )
    canon = F.regexp_replace(canon, r"/(\?|$)", r"$1")
    return (
        docs.select(canon.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# ─────────────────── hashed-feature linear classifier ────────────

# fastText-shaped scoring with a deterministic stand-in for learned
# state: feature index from cheap char arithmetic (first char, last
# char, length), weight = (idx % 13) - 6 in tenths. The INTEGER score
# accumulates order-free (FP summation order differs between engines;
# integer sums are exact), and the decision threshold is integer too,
# so only the reported probability needs FP — computed once per doc
# from the integer score and floor-rounded to 4 decimals.
_FEAT_DIM = 64
_W_IDX = (
    "(ascii(substr({w}, 1, 1)) * 37"
    " + ascii(substr({w}, length({w}), 1)) * 17"
    f" + length({{w}})) % {_FEAT_DIM}"
)
_WEIGHT = f"(({_W_IDX} % 13) - 6)"

_QC_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         len(string_split(text, ' ')) AS n_words
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(SUM({_WEIGHT.format(w="w")}) AS BIGINT) AS iscore,
         MAX(n_words) AS n_words
  FROM words GROUP BY doc_id
)
SELECT doc_id, iscore,
       floor(10000.0 / (1.0 + exp(-((iscore / 10.0 - 0.1)
                                    / sqrt(CAST(n_words AS DOUBLE)))))
             + 0.5) / 10000.0 AS quality_prob,
       iscore > 1 AS is_high_quality
FROM scored
"""


@register("quality_classifier_linear", _QC_SQL)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed token features, the
    fastText pattern: hash each token to one of {_FEAT_DIM} buckets,
    sum the bucket weights, squash the length-normalized margin
    through a sigmoid. Zero shuffle, zero Python — the whole model
    application is one ``aggregate()`` higher-order function over the
    split array per row, evaluated JVM-side (HOFs sit outside
    whole-stage codegen but never leave Tungsten rows; the plan has
    no Exchange at all) (swap the arithmetic weight for an
    ``element_at`` over a broadcast weights array to serve a real
    trained model; the plan shape is identical). The label comes from
    the exact integer score, not the rounded probability, so the
    decision boundary is bit-stable on any engine or partitioning."""
    docs = load(spark, sf_dir, "documents")
    weight = _WEIGHT.format(w="w")
    return docs.select(
        "doc_id",
        F.expr(
            f"""aggregate(split(text, ' '), CAST(0 AS BIGINT),
                          (acc, w) -> acc + CAST({weight} AS BIGINT))"""
        ).alias("iscore"),
        F.expr("size(split(text, ' '))").alias("n_words"),
    ).select(
        "doc_id",
        "iscore",
        F.expr(
            """floor(CAST(10000.0 AS DOUBLE)
                     / (1.0 + exp(-((iscore / 10.0 - 0.1)
                                    / sqrt(CAST(n_words AS DOUBLE)))))
                     + 0.5) / CAST(10000.0 AS DOUBLE)"""
        ).alias("quality_prob"),
        (F.col("iscore") > 1).alias("is_high_quality"),
    )
