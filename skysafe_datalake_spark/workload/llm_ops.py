"""Training-data-pipeline operators (BASELINE.json north star):
deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, multimodal
columns — each as an oracle-checked query over the driver's
documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skysafe_datalake_spark.functions import text as T
from skysafe_datalake_spark.operators import dedup as D
from skysafe_datalake_spark.operators import multimodal as MM
from skysafe_datalake_spark.operators.similarity import cosine, cosine_topk
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.sketches import hex_int_sql
from skysafe_datalake_spark.workload.tables import load, pround, pround_sql

# ───────────────────────── dedup family ──────────────────────────


@register(
    "dedup_exact",
    """
SELECT min(doc_id) AS canonical_id, count(*) AS n_dups
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (deterministic canonical row —
    not dropDuplicates, which keeps an arbitrary one)."""
    docs = load(spark, sf_dir, "documents")
    return D.exact_dedup(docs, F.col("text"), "doc_id")


@register(
    "doc_fingerprint",
    r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 document fingerprint (formatting-insensitive
    exact-dedup key)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.normalized_fingerprint(F.col("text")).alias("fingerprint")
    )


_N_HASHES = 8

# Shingle stream for minhash — duplicates left in: min() is
# insensitive to them, and the engine-side operator skips the dedup
# shuffle for the same reason.
_SHINGLES_CTE = """
sh AS (
  SELECT doc_id, substr(lower(text), i, 5) AS sh
  FROM documents, unnest(generate_series(1, greatest(length(text) - 4, 0))) AS t(i)
  WHERE length(text) >= 5
)
"""

# Twin of operators.dedup.minhash_signatures' hash family: two md5
# digests → 64 hex chars → 8 disjoint 32-bit slices parsed to bigint.
_SIG_CTE = (
    "hd AS (SELECT doc_id, md5('a|' || sh) || md5('b|' || sh) AS h FROM sh),\n"
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"min(CAST(('0x' || substr(h, {1 + 8 * i}, 8)) AS BIGINT)) AS mh{i}"
        for i in range(_N_HASHES)
    )
    + " FROM hd GROUP BY doc_id)"
)


@register(
    "minhash_signatures",
    f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE}
SELECT * FROM sig
""",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5-derived, engine-portable) over distinct
    5-char shingles; map-side combine keeps the shuffle at
    O(docs x n_hashes)."""
    docs = load(spark, sf_dir, "documents")
    return D.minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_k=5
    )


_BANDS_SQL = ", ".join(
    f"concat('{b}|', mh{2 * b}, '|', mh{2 * b + 1})" for b in range(_N_HASHES // 2)
)
_MATCH_SQL = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(_N_HASHES)
)
# Keep threshold: pairs survive when >= half the signature components
# match (estimated Jaccard >= _MIN_MATCHING / _N_HASHES). One constant
# feeds BOTH the Spark operator call and the oracle SQL predicate.
_MIN_MATCHING = 4


@register(
    "dedup_minhash_lsh",
    f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.*, band_key
  FROM sig, unnest([{_BANDS_SQL}]) AS u(band_key)
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       {_MATCH_SQL} AS n_matching
FROM banded a JOIN banded b USING (band_key)
WHERE a.doc_id < b.doc_id AND {_MATCH_SQL} >= {_MIN_MATCHING}
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup candidates: banding equi-join (4 bands x
    2 rows), kept when >= half the signature components match
    (estimated Jaccard >= 0.5). Never an all-pairs comparison."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", "text", n_hashes=_N_HASHES)
    return D.minhash_lsh_pairs(
        sigs, "doc_id", n_hashes=_N_HASHES, band_size=2,
        min_matching=_MIN_MATCHING,
    )


@register(
    "dedup_simhash",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, i AS bit, CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM th, unnest(generate_series(0, 59)) AS t(i)
),
sums AS (SELECT doc_id, bit, SUM(c) AS s FROM bits GROUP BY doc_id, bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit frequency-weighted SimHash fingerprints (near-dups
    differ in few bits). 60 bits, not 16: with 4-bit blocking bands a
    16-bit fingerprint has only 4*16 = 64 possible band keys TOTAL,
    so the banded candidate join degenerates to all-pairs/16 at any
    real corpus size (the 8x scale smoke measured 785M candidates on
    40k docs). 15-bit bands give 4*32768 keys and candidates that
    track the true near-dup density."""
    docs = load(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text", n_bits=60)


@register(
    "dedup_ngram_jaccard",
    """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 500),
sh AS (
  SELECT DISTINCT doc_id, substr(lower(text), i, 5) AS sh
  FROM docs, unnest(generate_series(1, greatest(length(text) - 4, 0))) AS t(i)
  WHERE length(text) >= 5
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs (>= 0.5) on a capped subset
    (doc_id < 500 — full sf0.01 gate data; bounded at larger SFs,
    where the scale path is MinHash-LSH prefiltering first)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=5, threshold=0.5)


# ───────────────────────── similarity search ─────────────────────

_COS_SQL = (
    "list_dot_product(qv, cv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


@register(
    "similarity_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id >= 10
),
scored AS (
  SELECT q_id, c_id, {_COS_SQL} AS cosine_raw FROM q CROSS JOIN c
),
ranked AS (
  SELECT q_id, c_id, cosine_raw,
         CAST(row_number() OVER (
           PARTITION BY q_id
           ORDER BY floor(cosine_raw * 1000000.0 + 0.5) / 1000000.0 DESC, c_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, c_id,
       floor(cosine_raw * 10000.0 + 0.5) / 10000.0 AS cosine,
       rank
FROM ranked WHERE rank <= 5
""",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5: 10 query vectors broadcast against
    the corpus; exact ANN baseline (zip_with/aggregate dot products,
    JVM-side)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    out = cosine_topk(
        queries, corpus, query_id="q_id", corpus_id="c_id", vec="embedding", k=5
    )
    return out.select(
        "q_id", "c_id", pround(F.col("cosine_raw"), 4).alias("cosine"), "rank"
    )


def _ann_planes(n_planes: int = 5, dim: int = 64, seed: int = 20260813) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, components rounded to
    6 decimals so the literals parse to bit-identical doubles in both
    Spark and DuckDB."""
    import random

    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def _ann_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, CAST([{lits}] AS DOUBLE[])) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


_ANN_PLANES = _ann_planes()


@register(
    "ann_lsh_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id >= 10
),
qb AS (SELECT q_id, qv, {_ann_bucket_sql('qv', _ANN_PLANES)} AS bucket FROM q),
cb AS (SELECT c_id, cv, {_ann_bucket_sql('cv', _ANN_PLANES)} AS bucket FROM c),
scored AS (
  SELECT q_id, c_id, qb.bucket AS bucket, {_COS_SQL} AS cosine_raw
  FROM qb JOIN cb USING (bucket)
),
ranked AS (
  SELECT q_id, c_id, bucket, cosine_raw,
         CAST(row_number() OVER (
           PARTITION BY q_id
           ORDER BY floor(cosine_raw * 1000000.0 + 0.5) / 1000000.0 DESC, c_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, c_id, bucket,
       floor(cosine_raw * 10000.0 + 0.5) / 10000.0 AS cosine,
       rank
FROM ranked WHERE rank <= 5
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH bucketing — the
    100 TB scale path for similarity search: comparisons drop from
    |Q|·|C| to within-bucket collisions (here 5 planes → 32 buckets,
    so ~1/32 of the brute-force work; recall tunes with plane count
    and multi-probe). The bucket key is an equi-join column, so at
    scale this is a plain shuffled/broadcast hash join instead of a
    cross join."""
    from skysafe_datalake_spark.operators.similarity import lsh_bucket_candidates

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    cand = lsh_bucket_candidates(
        queries, corpus, _ANN_PLANES, query_id="q_id", corpus_id="c_id", vec="embedding"
    )
    w = Window.partitionBy("q_id").orderBy(
        pround(F.col("cosine_raw"), 6).desc(), F.col("c_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select(
            "q_id", "c_id", "bucket",
            pround(F.col("cosine_raw"), 4).alias("cosine"), "rank",
        )
    )


@register(
    "embedding_neardup",
    f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       floor((list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))))
             * 10000.0 + 0.5) / 10000.0 AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec)
      / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) > 0.3
""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine > 0.3 — tuned to the
    synthetic embeddings' similarity range). Exact all-pairs via
    block GEMM (one BLAS matmul per Arrow batch against the
    broadcast normalized corpus — see
    operators.similarity.block_neardup_pairs); the 100 TB path
    buckets with random-hyperplane LSH first."""
    from skysafe_datalake_spark.operators.similarity import block_neardup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return block_neardup_pairs(
        emb, id_col="vec_id", vec="embedding", threshold=0.3, round_digits=4
    )


# ───────────────────────── text analysis ─────────────────────────


@register(
    "text_quality",
    r"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_words, n_punct, n_stop,
       CAST((CASE WHEN n_chars >= 200 THEN 40 WHEN n_chars >= 50 THEN 25 ELSE 5 END)
          + (CASE WHEN n_words > 0 AND n_stop * 100 >= n_words * 5 THEN 30 WHEN n_stop > 0 THEN 15 ELSE 0 END)
          + (CASE WHEN n_punct * 100 > n_chars * 10 THEN 0 ELSE 30 END) AS INTEGER)
         AS quality_score
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword heuristics in
    pure integer arithmetic (no UDFs, engine-portable)."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        T.word_count(t).alias("n_words"),
        T.punct_count(t).alias("n_punct"),
        T.stopword_count(t, "en").alias("n_stop"),
        T.quality_score(t).alias("quality_score"),
    )


_LANG_HITS_SQL = {
    lang: (
        "len(regexp_extract_all(lower(text), '\\b("
        + "|".join(sw)
        + ")\\b'))"
    )
    for lang, sw in T.LANG_STOPWORDS.items()
}

_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {lang}_hits > 0 AND {lang}_hits = best THEN '{lang}'"
        for lang in T.LANG_STOPWORDS
    )
    + " ELSE 'und' END"
)


@register(
    "lang_id",
    f"""
WITH h AS (
  SELECT doc_id,
         {", ".join(f"{sql} AS {lang}_hits" for lang, sql in _LANG_HITS_SQL.items())}
  FROM documents
),
b AS (
  SELECT *, greatest({", ".join(f"{lang}_hits" for lang in T.LANG_STOPWORDS)}) AS best
  FROM h
)
SELECT doc_id, {_LANG_CASE} AS lang_pred
FROM b
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID (n-gram heuristic): argmax of stopword
    hits per language, fixed tie order."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "token_count",
    r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpe_tokens
FROM documents
""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: whitespace tokens + BPE-ish subword units."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0)).alias("n_ws_tokens"),
        T.bpe_token_count(t).alias("n_bpe_tokens"),
    )


# ───────────────────────── multimodal columns ────────────────────


@register(
    "multimodal_manifest",
    """
SELECT doc_id AS item_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(text)))[1:8] AS header_hex
FROM documents
""",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column manifest: payload byte length + magic-bytes
    header, all JVM expressions — the metadata surface a media lake
    queries without decoding payloads. (documents.text stands in as
    the opaque payload via utf-8 encode.)"""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(encode(text, 'utf-8'), 1, 4)"))).alias(
            "header_hex"
        ),
    )


_BYTE_HIST_SQL = ", ".join(
    f"coalesce(SUM(CASE WHEN byte % 8 = {k} THEN c END), 0)" for k in range(8)
)


@register(
    "multimodal_byte_features",
    f"""
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
  FROM documents
),
bytes AS (
  SELECT doc_id, n,
         unnest(list_transform(generate_series(1, n),
                i -> CAST(concat('0x', substr(hx, 2*i-1, 2)) AS INT))) AS byte
  FROM b
),
counts AS (
  SELECT doc_id, n, byte, count(*) AS c
  FROM bytes GROUP BY doc_id, n, byte
)
SELECT doc_id AS item_id, n AS n_bytes,
       floor(SUM(byte * c) * 1.0 / n * 10000.0 + 0.5) / 10000.0 AS byte_mean_r,
       floor(-SUM((c * 1.0 / n) * log2(c * 1.0 / n)) * 10000.0 + 0.5) / 10000.0
         AS byte_entropy_r,
       array_to_string([{_BYTE_HIST_SQL}], ',') AS hist_csv
FROM counts GROUP BY doc_id, n
""",
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over binary
    payloads — the real multimodal plumbing with the decode kernel
    stubbed to deterministic byte statistics (codecs not in this
    container; see operators/multimodal.py).

    The oracle recomputes the byte statistics relationally from the
    hex encoding, so the mapInPandas stage is fully hash-checked.
    ``feature_vec`` (fractions) is rescaled back to exact integer
    counts for the CSV so no cross-engine float formatting is
    involved; the two float stats are portably rounded doubles.
    Assumes non-empty payloads (true of the documents fixture) —
    empty docs would drop out of the byte-count oracle but not the
    Python stub."""
    docs = load(spark, sf_dir, "documents")
    with_media = docs.select(
        F.col("doc_id").alias("item_id"), F.encode(F.col("text"), "utf-8").alias("media")
    )
    feats = MM.extract_media_features(with_media, decode_stub=True)
    n = F.col("n_bytes")
    return feats.select(
        "item_id",
        "n_bytes",
        pround(F.col("byte_mean"), 4).alias("byte_mean_r"),
        pround(F.col("byte_entropy"), 4).alias("byte_entropy_r"),
        F.array_join(
            F.transform(
                F.col("feature_vec"),
                lambda x: F.round(x * n).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("hist_csv"),
    )


# ─────────────────────── dataset management ──────────────────────


_SPLIT_BUCKET_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
)


def _split_bucket():
    """Engine twin of _SPLIT_BUCKET_SQL: the stable md5 doc-id bucket
    in [0, 100). One definition for the three split consumers
    (dataset_split, stratified_sample, llm_corpus_prep) — the SQL side
    was already centralized, the engine side was pasted 3x and a
    one-sided hash-width change would only surface at the gate."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )


def _split_label(bucket):
    """80/10/10 bucket -> split label, aliased 'split'."""
    return (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("split")
    )


@register(
    "dataset_split",
    f"""
SELECT doc_id, lang,
       CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM documents
""",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split (80/10/10) by
    hashing the stable document id — the reproducible-split primitive
    every training pipeline needs: adding documents never reshuffles
    existing assignments (unlike randomSplit, whose output depends on
    partitioning), and the same doc lands in the same split on any
    cluster, any engine. Pure map — no shuffle at any scale."""
    docs = load(spark, sf_dir, "documents")
    bucket = _split_bucket()
    return docs.select(
        "doc_id",
        "lang",
        _split_label(bucket),
    )


@register(
    "stratified_sample",
    f"""
WITH rates(lang, rate) AS (VALUES ('en', 10), ('de', 40), ('fr', 40),
                                  ('es', 70), ('zh', 100))
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100
      < r.rate
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep-rates
    (down-sample dominant languages, keep the tail) applied through
    the same stable id-hash as dataset_split. The tail language is the
    corpus's actual 'zh' — the rate table used to list a nonexistent
    'ja', so the inner join silently DROPPED every Chinese document at
    0% (round-9 review; both sides shared the wrong table, so the gate
    could never catch it). The rate table is a
    broadcast join — at 100 TB this is a map-only scan that never
    shuffles the corpus, and reruns select byte-identical samples
    (sample_fraction/TABLESAMPLE cannot promise either)."""
    docs = load(spark, sf_dir, "documents")
    rates = F.broadcast(
        spark.createDataFrame(
            [("en", 10), ("de", 40), ("fr", 40), ("es", 70), ("zh", 100)],
            "lang STRING, rate INT",
        )
    )
    bucket = _split_bucket()
    return (
        docs.join(rates, ["lang"])
        .filter(bucket < F.col("rate"))
        .select("doc_id", "lang")
    )


@register(
    "bigram_topk",
    """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM toks WHERE len(ts) >= 2
)
SELECT bigram, COUNT(*) AS n
FROM big GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams — the n-gram counting step of LM data
    prep, computed array-natively: adjacent pairs come from a
    ``transform(sequence(...))`` over each document's token array
    (no per-token shuffle, no self-join on position — the only
    exchange is the final count aggregation, map-side-combined on
    ~vocabulary² keys), then TakeOrderedAndProject for the cut."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias(
            "ts"
        )
    ).where(F.size("ts") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))")
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@register(
    "chunk_documents",
    """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
starts AS (
  SELECT doc_id, ts,
         unnest(generate_series(1, greatest(len(ts) - 10, 1), 40)) AS start
  FROM toks WHERE len(ts) >= 1
)
SELECT doc_id,
       CAST((start - 1) / 40 AS INTEGER) AS chunk_idx,
       array_to_string(ts[start : start + 49], ' ') AS chunk_text,
       CAST(len(ts[start : start + 49]) AS INTEGER) AS n_tokens
FROM starts
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token chunks, 10-token
    overlap, stride 40) — the tokenize→chunk step that turns a corpus
    into training examples. Array-native: chunk starts come from
    ``sequence(1, n-overlap, stride)`` and each chunk is a
    ``slice`` + ``array_join`` over the per-doc token array, so the
    whole operator is a Generate + projection inside codegen — no
    shuffle at all, no Python; output rows ≈ input tokens / stride,
    embarrassingly parallel over input splits at any scale."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias(
            "ts"
        ),
    ).where(F.size("ts") >= 1)
    starts = toks.select(
        "doc_id",
        "ts",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("ts") - F.lit(10), F.lit(1)),
                F.lit(40),
            )
        ).alias("start"),
    )
    chunk = F.slice(F.col("ts"), F.col("start"), 50)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / 40).cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_tokens"),
    )


@register(
    "embedding_quantize",
    """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
scaled AS (
  SELECT vec_id, vec,
         127.0 / list_max(list_transform(vec, x -> abs(x))) AS scale
  FROM v
  WHERE list_max(list_transform(vec, x -> abs(x))) > 0.0
),
q AS (
  SELECT vec_id, vec, scale,
         list_transform(vec, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS qvec
  FROM scaled
)
SELECT vec_id,
       array_to_string(qvec, ',') AS qvec_csv,
       floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale_r,
       floor(list_max(list_transform(generate_series(1, len(vec)),
                                     i -> abs(vec[i] - qvec[i] / scale)))
             * 1000000.0 + 0.5) / 1000000.0 AS max_abs_err
FROM q
""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embedding vectors (per-vector
    scale = 127/max|x|) plus the reconstruction-error audit — the
    4x storage/bandwidth reduction that makes a 100 TB embedding
    store shuffle-able. Pure higher-order array expressions
    (transform / array_max / zip_with), zero shuffle, zero Python;
    the error column is the quality gate a pipeline would alert on."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", vec.alias("vec"))
    max_abs = F.array_max(F.transform(F.col("vec"), F.abs))
    scaled = v.where(max_abs > 0.0).select(
        "vec_id", "vec", (F.lit(127.0) / max_abs).alias("scale")
    )
    qvec = F.transform(
        F.col("vec"),
        lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("int"),
    )
    q = scaled.select("vec_id", "vec", "scale", qvec.alias("qvec"))
    err = F.array_max(
        F.zip_with(
            F.col("vec"),
            F.col("qvec"),
            lambda x, qx: F.abs(x - qx.cast("double") / F.col("scale")),
        )
    )
    # qvec serialized to CSV so the external gate's canonicalizer (a
    # pandas sort + hash, which cannot hash list cells) can check the
    # values; int components make the text form exact on both engines.
    return q.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
        pround(F.col("scale"), 6).alias("scale_r"),
        pround(err, 6).alias("max_abs_err"),
    )


_SIMHASH_SIG_SQL = """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, i AS bit, CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM th, unnest(generate_series(0, 59)) AS t(i)
),
sums AS (SELECT doc_id, bit, SUM(c) AS s FROM bits GROUP BY doc_id, bit),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id
)
"""


@register(
    "simhash_neardup_pairs",
    f"""
WITH {_SIMHASH_SIG_SQL},
banded AS (
  SELECT doc_id, simhash,
         unnest([{", ".join(f"concat('{b}|', CAST((simhash >> {15 * b}) & 32767 AS VARCHAR))" for b in range(4))}]) AS band_key
  FROM sig
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM banded a JOIN banded b USING (band_key)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRING (completes the fingerprint family):
    4 disjoint 15-bit bands block the candidates — pigeonhole
    guarantees any pair within Hamming distance 3 shares a band —
    then exact bit_count(xor) verifies. Candidate-then-verify, like
    MinHash-LSH, never all-pairs. The fingerprint is 60-bit: with
    4-BIT bands the key space is 64 values total and the "blocked"
    join is all-pairs/16 at any corpus size (the 8x scale smoke
    caught exactly that — 785M candidates on 40k docs); 15-bit bands
    make candidates track true near-dup density. Output is the pair
    LIST, so true near-dup cliques still cost their own output size
    — use ``dedup_keep_canonical``'s linear family decomposition
    when only the keep/drop decision is needed."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.simhash(docs, "doc_id", "text", n_bits=60)
    return D.simhash_neardup_pairs(
        sigs, "doc_id", n_bits=60, n_bands=4, max_hamming=3
    )


@register(
    "contamination_ngram_overlap",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 4),
                i -> array_to_string(list_slice(ts, i, i + 4), ' '))) AS gram
  FROM toks WHERE len(ts) >= 5
),
eval_g   AS (SELECT doc_id, gram FROM grams WHERE doc_id % 17 = 0),
corpus_g AS (SELECT doc_id, gram FROM grams WHERE doc_id % 17 <> 0),
keep AS (
  SELECT gram FROM corpus_g GROUP BY gram HAVING count(*) <= 50
),
eval_n AS (SELECT doc_id, count(*) AS n_grams FROM eval_g GROUP BY doc_id),
hits AS (
  SELECT e.doc_id AS eval_id, c.doc_id AS corpus_id, count(*) AS n_common
  FROM eval_g e
  JOIN keep USING (gram)
  JOIN corpus_g c USING (gram)
  GROUP BY e.doc_id, c.doc_id
)
SELECT h.eval_id, h.corpus_id, h.n_common,
       floor(h.n_common * 1.0 / n.n_grams * 1000000.0 + 0.5) / 1000000.0
         AS overlap_frac
FROM hits h JOIN eval_n n ON n.doc_id = h.eval_id
WHERE h.n_common * 1.0 / n.n_grams >= 0.2
""",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: which corpus documents
    contain >=20% of an eval document's distinct word 5-grams (the
    n-gram-overlap decontamination check of LLM data prep). Eval set
    = doc_id % 17 == 0, corpus = the rest.

    Scale shape — ONE pass over the corpus: grams come from an
    array-native transform(sequence(...)) (no per-token shuffle) and
    a single groupBy(gram) builds the inverted index (eval posting
    list, corpus posting list) — the eval x corpus comparison is the
    explode of that index, never all-pairs, and every downstream
    aggregate (per-eval gram counts, pair counts) derives from the
    index rather than re-scanning documents. Stop-gram suppression
    (corpus document frequency > 50 dropped) bounds the posting-list
    explode fan-out the same way df-capping does in production
    decontamination — so one index row expands to at most
    |eval_ids|·50 pairs."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias(
            "ts"
        ),
    ).where(F.size("ts") >= 5)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 4),"
                " i -> concat_ws(' ', slice(ts, i, 5)))"
            )
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % 17 == 0
    # collect_SET does the per-doc gram dedup inside the one index
    # aggregation (map-side partial sets), replacing the old separate
    # corpus-wide `.distinct()` — that was a SECOND corpus-scale
    # exchange of every (doc_id, gram) pair feeding this one (guide
    # §2.4/§2.3: the dedup and the index grouping share one shuffle).
    # r13 A/B at sf0.1: wall neutral (1.74 -> 1.89 s min-of-5, within
    # pass noise); the win is one corpus exchange + one stage barrier
    # fewer, which is what scales. Two rejected variants measured and
    # documented in OPTIMIZATION_r13.md: per-row array_distinct
    # (+0.3 s — quadratic-ish on long string arrays) and deriving
    # eval_n from the un-exchanged gram arrays (2.7x SLOWER — it
    # duplicated the tokenize subtree, which exchange reuse no longer
    # collapsed).
    index = grams.groupBy("gram").agg(
        F.collect_set(F.when(is_eval, F.col("doc_id"))).alias("eval_ids"),
        F.collect_set(F.when(~is_eval, F.col("doc_id"))).alias("corpus_ids"),
    )
    # per-eval-doc denominator, derived from the (vocab-sized) index
    eval_n = (
        index.select(F.explode("eval_ids").alias("eval_id"))
        .groupBy("eval_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    hits = (
        index.where(
            (F.size("eval_ids") > 0)
            & (F.size("corpus_ids") > 0)
            & (F.size("corpus_ids") <= 50)
        )
        .select(F.explode("eval_ids").alias("eval_id"), "corpus_ids")
        .select("eval_id", F.explode("corpus_ids").alias("corpus_id"))
        .groupBy("eval_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    frac = F.col("n_common") * F.lit(1.0) / F.col("n_grams")
    return (
        hits.join(F.broadcast(eval_n), "eval_id")
        .where(frac >= 0.2)
        .select(
            "eval_id",
            "corpus_id",
            "n_common",
            pround(frac, 6).alias("overlap_frac"),
        )
    )


@register(
    "embedding_l2_normalize",
    """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
n AS (SELECT vec_id, sqrt(list_dot_product(vec, vec)) AS nrm, vec FROM v)
SELECT vec_id,
       array_to_string(
         list_transform(vec,
           x -> CAST(CAST(floor(x / nrm * 1000000.0 + 0.5) AS BIGINT)
                     AS VARCHAR)), ',') AS unit_ppm_csv,
       floor(nrm * 1000000.0 + 0.5) / 1000000.0 AS norm_r
FROM n
WHERE nrm > 0
""",
)
def embedding_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-L2 normalization of the embedding column — the prep step
    every cosine/ANN consumer assumes. Pure higher-order array
    expressions (zero-shuffle projection). Components are serialized
    as parts-per-million INTEGERS: integer text is bit-exact across
    engines, where double→string formatting is not (Spark prints
    1.0E-6, DuckDB 1e-06) — same convention as embedding_quantize's
    int8 payload."""
    from skysafe_datalake_spark.operators.similarity import norm as l2norm

    emb = load(spark, sf_dir, "embeddings")
    nrm = l2norm(F.col("embedding"))
    ppm = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") / F.col("nrm") * F.lit(1000000.0) + F.lit(0.5)
        ).cast("string"),
    )
    return (
        emb.withColumn("nrm", nrm)
        .where(F.col("nrm") > 0)
        .select(
            "vec_id",
            F.array_join(ppm, ",").alias("unit_ppm_csv"),
            pround(F.col("nrm"), 6).alias("norm_r"),
        )
    )


@register(
    "llm_corpus_prep",
    rf"""
WITH m AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, lang, text,
         CAST((CASE WHEN n_chars >= 200 THEN 40 WHEN n_chars >= 50 THEN 25 ELSE 5 END)
            + (CASE WHEN n_words > 0 AND n_stop * 100 >= n_words * 5 THEN 30 WHEN n_stop > 0 THEN 15 ELSE 0 END)
            + (CASE WHEN n_punct * 100 > n_chars * 10 THEN 0 ELSE 30 END) AS INTEGER)
           AS quality_score
  FROM m
),
kept AS (SELECT * FROM scored WHERE quality_score >= 70),
canon AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ORDER BY doc_id) AS rn
  FROM kept
)
SELECT doc_id, lang, quality_score,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]'))
         AS n_bpe_tokens,
       CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM canon WHERE rn = 1
""",
)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-prep slice in ONE declarative plan:
    quality gate (score >= 70) → exact near-dup canonicalization
    (normalized-fingerprint groups, keep min doc_id) → token budget →
    deterministic hash split. What a user runs nightly over the whole
    corpus; Catalyst fuses the scoring/filter/projection into the
    scan stage, the fingerprint canonicalization is the single
    shuffle, and the split assignment stays a pure map — so the whole
    pipeline is one exchange end to end at any scale."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        t.alias("text"),
        T.quality_score(t).alias("quality_score"),
    ).where(F.col("quality_score") >= 70)
    w = Window.partitionBy(T.normalized_fingerprint(F.col("text"))).orderBy(
        "doc_id"
    )
    canon = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    bucket = _split_bucket()
    return canon.select(
        "doc_id",
        "lang",
        "quality_score",
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        _split_label(bucket),
    )


@register(
    "multimodal_frame_sample",
    """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, unnest(generate_series(0, (n - 1) // 1024)) AS fr, hx, n
  FROM b WHERE n > 0
)
SELECT doc_id AS item_id,
       CAST(fr AS INT) AS frame_no,
       CAST(length(substr(hx, fr * 2048 + 1, 128)) // 2 AS INT) AS frame_len,
       substr(hx, fr * 2048 + 1, 128) AS frame_hex
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video → keyframes surrogate): the
    1→N mapInPandas fan-out over binary payloads, sampling a 64-byte
    "frame" every 1024 bytes. The decode stays a deterministic byte
    slice (codecs absent from this container — operators/multimodal
    stub contract), but the Spark shape — Arrow batching, BinaryType
    frames, fan-out schema — is the real thing, and the oracle
    re-derives every frame byte-for-byte from the hex encoding, so
    the kernel is fully hash-checked (same approach that fixed
    multimodal_byte_features in round 1)."""
    docs = load(spark, sf_dir, "documents")
    with_media = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
    )
    frames = MM.sample_frames(
        with_media, every_n_bytes=1024, frame_bytes=64
    )
    return frames.select(
        "item_id",
        "frame_no",
        F.length(F.col("frame")).cast("int").alias("frame_len"),
        F.hex(F.col("frame")).alias("frame_hex"),
    )


@register(
    "quality_repetition",
    """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 2),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
  FROM toks WHERE len(ts) >= 3
),
stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tri, count(*) AS n_uniq,
         CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_in_dup
  FROM (SELECT doc_id, g, count(*) AS cnt FROM tri GROUP BY doc_id, g) c
  GROUP BY doc_id
)
SELECT doc_id, n_tri, n_uniq,
       floor(n_in_dup * 1.0 / n_tri * 1000000.0 + 0.5) / 1000000.0
         AS dup_tri_frac,
       (n_in_dup * 1.0 / n_tri) > 0.2 AS is_repetitive
FROM stats
""",
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: the fraction of a document's
    word trigrams that belong to repeated trigram groups (boilerplate
    and looping text score high; >0.2 flags the doc). Per-document
    metric — the trigram counting partial-aggregates map-side per
    (doc, gram), then one row per doc; the corpus is never joined
    against itself, so the plan is two hash aggregations deep at any
    scale."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias(
            "ts"
        ),
    ).where(F.size("ts") >= 3)
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 2),"
                " i -> concat_ws(' ', ts[i-1], ts[i], ts[i+1]))"
            )
        ).alias("g"),
    )
    per_gram = tri.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tri"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "n_in_dup"
        ),
    )
    frac = F.col("n_in_dup") * F.lit(1.0) / F.col("n_tri")
    return stats.select(
        "doc_id",
        "n_tri",
        "n_uniq",
        pround(frac, 6).alias("dup_tri_frac"),
        (frac > 0.2).alias("is_repetitive"),
    )


@register(
    "embedding_crossdup",
    """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
batch AS (SELECT * FROM v WHERE vec_id % 10 = 0),
corpus AS (SELECT * FROM v WHERE vec_id % 10 <> 0)
SELECT c.vec_id AS a_id, b.vec_id AS b_id,
       floor((list_dot_product(c.vec, b.vec)
              / (sqrt(list_dot_product(c.vec, c.vec))
                 * sqrt(list_dot_product(b.vec, b.vec))))
             * 10000.0 + 0.5) / 10000.0 AS cosine
FROM corpus c CROSS JOIN batch b
WHERE list_dot_product(c.vec, b.vec)
      / (sqrt(list_dot_product(c.vec, c.vec))
         * sqrt(list_dot_product(b.vec, b.vec))) > 0.3
""",
)
def embedding_crossdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-corpus near-dup: corpus vectors that near-duplicate
    any vector of an incoming batch (vec_id % 10 == 0 plays the
    batch). The batch broadcasts, the corpus streams through one BLAS
    GEMM per Arrow batch — no corpus shuffle, no self-join
    (operators.similarity.cross_neardup_pairs)."""
    from skysafe_datalake_spark.operators.similarity import cross_neardup_pairs

    emb = load(spark, sf_dir, "embeddings")
    batch = emb.where(F.col("vec_id") % 10 == 0)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    return cross_neardup_pairs(
        corpus, batch, id_col="vec_id", vec="embedding", threshold=0.3
    )


# ──────────────── corpus-level curation composites ───────────────


@register(
    "dedup_keep_canonical",
    f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.*, band_key
  FROM sig, unnest([{_BANDS_SQL}]) AS u(band_key)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b USING (band_key)
  WHERE a.doc_id < b.doc_id AND {_MATCH_SQL} >= {_MIN_MATCHING}
),
drops AS (SELECT DISTINCT b_id AS doc_id FROM pairs)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
""",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: the filtered corpus, not the
    pair list. Keep-first policy — a document is dropped iff some
    LSH-candidate duplicate with a SMALLER doc_id exists (banded
    MinHash, est. Jaccard >= 0.5). One-pass and shuffle-bounded by
    the candidate pairs: no transitive closure needed, because every
    non-minimal member of a duplicate chain has a direct candidate
    edge to some smaller id with >= the chain's similarity. For
    exact cluster-canonical semantics under sparser edge sets, feed
    ``dedup_clusters``' components into the same anti-join instead.
    Scale shape: the drop list comes from
    ``operators.dedup.minhash_drop_nonminimal`` — the component-family
    decomposition that answers "does a smaller-id candidate exist"
    with two linear hash aggregations and NO pair join (the banded
    pair join is quadratic inside each bucket, and the 8x scale smoke
    measured template-corpus buckets growing with the corpus: 41x
    candidates at 8x data, 19x wall; this path is provably
    output-identical and O(60·n)) + a broadcast-able drop-list
    anti-join (|drops| << |corpus| at web dedup rates)."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", "text", n_hashes=_N_HASHES)
    drops = D.minhash_drop_nonminimal(
        sigs, "doc_id", n_hashes=_N_HASHES, band_size=2, min_matching=_MIN_MATCHING
    )
    return docs.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "lang_temperature_sample",
    """
WITH counts AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
m AS (SELECT MIN(n_l) AS n_min FROM counts),
rates AS (
  SELECT lang,
         CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE))
                    * 1048576) AS BIGINT) AS keep_below
  FROM counts, m
)
SELECT d.doc_id, d.lang,
       CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)
            AS BIGINT) < r.keep_below AS keep
FROM documents d JOIN rates r USING (lang)
""",
)
def lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual
    data-mixing step: sample language l at rate ∝ p_l^(α-1) so
    high-resource languages are downsampled, rarest kept whole).
    α = 0.5 on purpose — the rate is then sqrt(n_min/n_l), and IEEE
    sqrt/division are correctly rounded everywhere, so the sampling
    threshold is BIT-IDENTICAL across engines (pow() with arbitrary
    exponents is only 1-ulp-accurate and could flip a floor()).
    The keep decision is a deterministic per-doc hash (Knuth
    multiplicative mod 2^20) against the per-language threshold:
    reproducible on any cluster layout, no RNG state. Scale shape:
    5-row rate table broadcast onto the corpus scan — one job, no
    extra shuffle over the data."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("n_min") / F.col("n_l")) * F.lit(1048576)
        ).cast("long").alias("keep_below"),
    )
    return docs.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        # 5 md5 hex chars = exactly [0, 2^20): overflow-free at ANY
        # doc_id — the former doc_id * 2654435761 exceeded signed
        # int64 past doc_id ~3.47e9 and ANSI mode aborts the job on
        # exactly the web-scale ids this query claims to serve
        # (round-9 review).
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5),
                16,
                10,
            ).cast("long")
            < F.col("keep_below")
        ).alias("keep"),
    )


@register(
    "unigram_logprob_score",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
scored AS (
  SELECT tok,
         CAST(floor(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_e6
  FROM vocab, tot
)
SELECT t.doc_id, COUNT(*) AS n_toks,
       CAST(SUM(s.nll_e6) AS BIGINT) AS nll_sum_e6,
       CAST(SUM(s.nll_e6) AS BIGINT) / COUNT(*) / 1000000.0 AS mean_nll
FROM toks t JOIN scored s USING (tok)
GROUP BY t.doc_id
""",
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-style quality score: mean per-token negative
    log-likelihood under the corpus's own unigram distribution
    (CCNet's perplexity filter with the LM reduced to unigrams —
    boilerplate of common tokens scores low NLL, rare-token noise
    scores high). Cross-engine exactness: each token's -ln(p) is
    quantized ONCE to integer micro-nats in the (vocabulary-sized)
    score table, so the per-document reduction is an integer SUM —
    associative, partition-order-free — and the mean is derived from
    the two integers. Scale shape: two hash aggregations over the
    token stream plus a vocabulary-bounded broadcast join; nothing
    grows with corpus size except the map-side-combined token
    counts."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.floor(
            -F.log(F.col("cnt") / F.col("total")) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long").alias("nll_e6"),
    )
    return (
        toks.join(F.broadcast(scored), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("nll_e6").alias("nll_sum_e6"),
        )
        .select(
            "doc_id",
            "n_toks",
            "nll_sum_e6",
            (F.col("nll_sum_e6") / F.col("n_toks") / F.lit(1000000.0)).alias(
                "mean_nll"
            ),
        )
    )


# ─────────────── block-level exact dedup (reconstructing) ────────

_BLOCK_W = 8  # words per block

_BLOCK_DEDUP_SQL = f"""
WITH doc_words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
blockix AS (
  SELECT doc_id, ws,
         CAST(unnest(range(CAST(ceil(len(ws) / {_BLOCK_W}.0) AS BIGINT)))
              AS BIGINT) AS bi
  FROM doc_words
),
blocks AS (
  SELECT doc_id, bi,
         array_to_string(ws[bi*{_BLOCK_W}+1 : bi*{_BLOCK_W}+{_BLOCK_W}], ' ')
           AS block
  FROM blockix
),
kept AS (
  SELECT doc_id, bi, block,
         row_number() OVER (PARTITION BY block ORDER BY doc_id, bi) AS rn
  FROM blocks
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
  FROM blocks GROUP BY doc_id
)
SELECT k.doc_id,
       string_agg(k.block, ' ' ORDER BY k.bi) AS dedup_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       MIN(t.n_total) AS n_total
FROM kept k
JOIN tot t ON t.doc_id = k.doc_id
WHERE k.rn = 1
GROUP BY k.doc_id
"""


@register("block_dedup_reconstruct", _BLOCK_DEDUP_SQL)
def block_dedup_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup with reconstruction — the
    paragraph-dedup stage of a pretraining pipeline (fixed 8-word
    blocks stand in for paragraphs on the single-line synthetic
    corpus): split every document into blocks, keep only each
    block's FIRST global occurrence (ordered by doc_id, then block
    index), and stitch the survivors back into a deduplicated
    document. Documents whose every block is a repeat drop out
    entirely.

    Scale shape: block extraction is per-row array code (sequence →
    slice → array_join, zero shuffle); first-occurrence selection is
    ONE shuffle keyed on the block text (skew-safe: a block repeated
    billions of times still reduces map-side via the row_number
    window's sort within its partition — for pathological skew swap
    in a min_by aggregation, same semantics); reconstruction is one
    more shuffle on doc_id. No driver materialization at any point.
    """
    docs = load(spark, sf_dir, "documents")
    w = _BLOCK_W
    blocks = docs.select(
        "doc_id",
        F.expr(
            f"""inline(transform(
                  sequence(0, cast(ceil(size(split(text,' ')) / {w}.0) as int) - 1),
                  bi -> struct(
                    cast(bi as bigint) as bi,
                    array_join(slice(split(text,' '), bi*{w}+1, {w}), ' ')
                      as block)))"""
        ),
    )
    # ONE corpus scan: first-occurrence rank and the per-document
    # block total are two window passes over the same exploded block
    # stream (the doc_id window's hash partitioning is then reused by
    # the final groupBy — no extra exchange), instead of re-scanning
    # and re-exploding the corpus for a totals table + join.
    first = Window.partitionBy("block").orderBy("doc_id", "bi")
    per_doc = Window.partitionBy("doc_id")
    kept = (
        blocks.withColumn("rn", F.row_number().over(first))
        .withColumn("n_total", F.count("*").over(per_doc))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bi", "block"))),
                lambda s: s["block"],
            ),
            " ",
        ).alias("dedup_text"),
        F.count("*").alias("n_kept"),
        F.min("n_total").alias("n_total"),
    ).select("doc_id", "dedup_text", "n_kept", "n_total")


# ─────────────── sequence packing (concat-and-split) ─────────────

_CTX = 256  # tokens per packed training sequence

_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS start_off
  FROM toks
)
SELECT doc_id, source, n_tokens, start_off,
       start_off // {_CTX} AS seq_id,
       start_off % {_CTX} AS pos_in_seq
FROM packed
"""


@register("sequence_packing", _PACKING_SQL)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, concat-and-split style: documents
    are laid end-to-end in a deterministic order and the token
    stream is cut into fixed {ctx}-token context windows; each
    document gets its byte-stream start offset, the sequence id it
    starts in, and its offset within that sequence (documents may
    straddle a boundary — the downstream batcher splits them, same
    as GPT-style pretraining packers).

    Scale shape: packing is per-SHARD (PARTITION BY source), so the
    running-sum window parallelizes across shards instead of forcing
    one global sort — the layout real pipelines use (pack within a
    shard, name sequences (shard, seq_id)). Token counts are pure
    per-row expressions; the only shuffle is the window's
    hash-partition on source. Integer arithmetic end to end."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    packed = toks.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_off",
        F.expr(f"start_off div {_CTX}").alias("seq_id"),
        (F.col("start_off") % _CTX).alias("pos_in_seq"),
    )


# ─────────────── deterministic corpus shuffle ────────────────────

_SHUF_SHARDS = 16
_SHUF_SALT = "epoch0"

_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         md5('{_SHUF_SALT}:' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
sharded AS (
  SELECT doc_id, skey,
         {hex_int_sql("skey", 4)} % {_SHUF_SHARDS} AS shard
  FROM keyed
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY substr(skey, 5), doc_id
       ) AS BIGINT) AS pos_in_shard
FROM sharded
"""


@register("corpus_shuffle_order", _SHUFFLE_SQL)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every epoch's data order must be (a) statistically shuffled,
    (b) reproducible from a seed, (c) computable WITHOUT a global
    sort. Each document gets a salt-keyed md5; the first 4 hex digits
    route it to one of {_SHUF_SHARDS} shards and the remaining digits
    order it within the shard — so the 'shuffle' is one hash
    partition plus per-shard sorts that run in parallel, never a
    single total order (the (shard, pos_in_shard) pair IS the global
    order, lexicographically). Changing the salt re-deals the entire
    order; same salt reproduces it bit-for-bit, which is what makes
    training runs resumable. Scale shape: one exchange on shard,
    per-shard sort bounded by shard size — the same layout sharded
    dataset formats (WebDataset, MDS) use."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(f"{_SHUF_SALT}:"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    )
    sharded = keyed.select(
        "doc_id",
        "skey",
        (F.expr(hex_int_sql("skey", 4)) % _SHUF_SHARDS)
        .cast("bigint")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.substring("skey", 5, 28), "doc_id"
    )
    return sharded.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


# ─────────────── MMR diversity reranking ─────────────────────────

_MMR_CANDS = 12
_MMR_SELECT = 5  # seed + 4 rounds
_MMR_LAM_NUM, _MMR_PEN_NUM = 7, 3  # λ = 0.7 as integer weights


def _cos_pair_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))"
    )


def _mmr_round_sql(k: int) -> str:
    prev = f"s{k - 1}"
    return f"""
pen{k} AS (
  SELECT c.id, c.qsim_e6, MAX(p.sim_e6) AS pen
  FROM cands c
  JOIN pairs p ON p.ai = c.id
  JOIN {prev} s ON s.vec_id = p.bi
  WHERE c.id NOT IN (SELECT vec_id FROM {prev})
  GROUP BY c.id, c.qsim_e6
),
pick{k} AS (
  SELECT {k} AS sel_round, id AS vec_id, qsim_e6
  FROM pen{k}
  ORDER BY {_MMR_LAM_NUM} * qsim_e6 - {_MMR_PEN_NUM} * pen DESC, id
  LIMIT 1
),
s{k} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{k})"""


_MMR_SQL = (
    f"""
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = 0
),
c AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id >= 10
),
scored AS (
  SELECT id, cv,
         CAST(floor(({_cos_pair_sql("cv", "qv")}) * 1000000.0 + 0.5)
              AS BIGINT) AS qsim_e6
  FROM c CROSS JOIN q
),
cands AS (SELECT id, cv, qsim_e6 FROM scored ORDER BY qsim_e6 DESC, id
          LIMIT {_MMR_CANDS}),
pairs AS (
  SELECT a.id AS ai, b.id AS bi,
         CAST(floor(({_cos_pair_sql("a.cv", "b.cv")}) * 1000000.0 + 0.5)
              AS BIGINT) AS sim_e6
  FROM cands a JOIN cands b ON a.id <> b.id
),
s0 AS (SELECT 0 AS sel_round, id AS vec_id, qsim_e6 FROM cands
       ORDER BY qsim_e6 DESC, id LIMIT 1),"""
    + ",".join(_mmr_round_sql(k) for k in range(1, _MMR_SELECT))
    + f"""
SELECT CAST(sel_round AS BIGINT) AS sel_round, CAST(vec_id AS BIGINT) AS vec_id,
       qsim_e6
FROM s{_MMR_SELECT - 1}
"""
)


@register("mmr_diversity_rerank", _MMR_SQL)
def mmr_diversity_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking — the diversity stage of
    a retrieval pipeline (don't return 5 near-duplicates of the best
    hit): from the top-12 cosine candidates for one query vector,
    greedily select 5, each round maximizing
    λ·sim(query, c) − (1−λ)·max_{s∈selected} sim(c, s) with λ=0.7.
    Pairwise and query similarities quantize ONCE to integer ppm, so
    every argmax comparison is integer (7·qsim − 3·penalty) with a
    vec_id tie-break — fully deterministic, and the oracle unrolls
    the identical greedy recursion as CTEs.

    Scale shape: the expensive part (query→corpus scoring) is the
    broadcast brute-force / ANN stage that feeds this; MMR itself
    touches only the candidate set (top-k per query — bounded), so
    the per-round joins are tiny and the unrolled plan is a chain of
    kilobyte-scale operators. The candidate set is localCheckpoint'd
    once so the rounds don't recompute the corpus scan."""
    import math

    emb = load(spark, sf_dir, "embeddings")
    to_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    q = emb.where(F.col("vec_id") == 0).select(to_d.alias("qv"))
    c = emb.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("id"), to_d.alias("cv")
    )
    qsim = F.floor(
        cosine(F.col("cv"), F.col("qv")) * 1000000.0 + 0.5
    ).cast("bigint")
    # Distributed part ends at the top-_MMR_CANDS cut (the corpus
    # scoring + TakeOrdered). Everything after touches ≤12 rows /
    # ≤132 pairs, which the old shape ran as ~20 kilobyte-scale Spark
    # jobs with an eager localCheckpoint per greedy round — pure
    # job-scheduling overhead. r13: collect the BOUNDED candidate set
    # (constant-size at any SF, the documented bounded-collect
    # exception — same class as the bloom bitmap and the centroid
    # pull) and run the greedy argmax on the driver. Arithmetic is
    # replicated operation-for-operation (sequential left-to-right
    # dot fold, IEEE sqrt/divide, floor(x*1e6+0.5)), so the integer
    # ppm scores — and therefore every argmax and tie-break — are
    # bit-identical to the old plan and the oracle. A/B at sf0.1:
    # 1.87 -> 0.80 s min-of-5, identical rows every pass.
    cand_rows = (
        c.crossJoin(F.broadcast(q))
        .select("id", "cv", qsim.alias("qsim_e6"))
        .orderBy(F.desc("qsim_e6"), "id")
        .limit(_MMR_CANDS)
        .collect()
    )

    def _cos_e6(u, v):
        acc = 0.0
        du = 0.0
        dv = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        for x in u:
            du = du + x * x
        for x in v:
            dv = dv + x * x
        return int(math.floor(acc / (math.sqrt(du) * math.sqrt(dv)) * 1000000.0 + 0.5))

    cands = [(r["id"], list(r["cv"]), r["qsim_e6"]) for r in cand_rows]
    sim = {
        (ai, bi): _cos_e6(av, bv)
        for ai, av, _ in cands
        for bi, bv, _ in cands
        if ai != bi
    }
    sel = [(0, cands[0][0], cands[0][2])]  # cands arrive ordered
    chosen = {cands[0][0]}
    for k in range(1, _MMR_SELECT):
        best = None
        for cid, _cv, cq in cands:
            if cid in chosen:
                continue
            pen = max(sim[(cid, sid)] for _, sid, _ in sel)
            score = _MMR_LAM_NUM * cq - _MMR_PEN_NUM * pen
            # argmax with ascending-id tie-break == ORDER BY score
            # DESC, id LIMIT 1 (cands iterate in ascending-id order
            # within equal qsim by construction; strict > keeps the
            # first = smallest id among ties).
            if best is None or score > best[0] or (score == best[0] and cid < best[1]):
                best = (score, cid, cq)
        if best is None:
            break  # fewer candidates than rounds: old plan emitted fewer rows
        sel.append((k, best[1], best[2]))
        chosen.add(best[1])
    return spark.createDataFrame(
        sel, "sel_round bigint, vec_id bigint, qsim_e6 bigint"
    )


# ─────────────── weighted reservoir sampling (A-Res) ─────────────

_ARES_K = 20
_ARES_SPACE = 16**12


@register(
    "weighted_sample_ares",
    f"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         ({hex_int_sql("md5('ares0:' || CAST(doc_id AS VARCHAR))", 12)} + 1)
           / CAST({_ARES_SPACE} AS DOUBLE) AS u
  FROM documents
),
scored AS (
  SELECT doc_id, lang, w,
         CAST(floor(ln(u) / CAST(w AS DOUBLE) * 1000000000.0 + 0.5)
              AS BIGINT) AS key_e9
  FROM keyed
),
ranked AS (
  SELECT doc_id, lang, w, key_e9,
         row_number() OVER (ORDER BY key_e9 DESC, doc_id) AS rn
  FROM scored
)
SELECT doc_id, lang, w, key_e9, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_ARES_K}
""",
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via Efraimidis–Spirakis
    A-Res: each item draws u ~ U(0,1] and ranks by u^(1/w) — the
    top-k under that key IS an exact weighted sample. Here u is a
    salt-keyed md5 uniform (seed-reproducible, like
    corpus_shuffle_order) and the ranking uses the monotone
    equivalent ln(u)/w, quantized once to integer nano-units so the
    top-k cut compares integers with a doc_id tie-break. Weight =
    document length, the usual size-biased corpus sampling.

    Why this shape at scale: A-Res needs ONE pass and a bounded
    top-k — per-partition heaps merged associatively (here
    TakeOrderedAndProject) — where naive weighted sampling needs
    normalized cumulative weights, i.e. a global prefix sum over all
    items. Changing the salt redraws the sample; the same salt
    reproduces it exactly, which is what makes pipeline reruns
    stable."""
    docs = load(spark, sf_dir, "documents")
    u = (
        F.expr(hex_int_sql("md5('ares0:' || CAST(doc_id AS STRING))", 12))
        + 1
    ) / F.lit(float(_ARES_SPACE))
    scored = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("w"),
        F.floor(
            F.log(u) / F.col("n_chars").cast("double") * 1000000000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("key_e9"),
    )
    # Scale shape: the top-k cut is an orderBy+limit
    # (TakeOrderedAndProject: per-partition heaps, driver merge of k
    # rows) — NEVER a global-order window over the full corpus; the
    # row numbers then attach on the k-row survivor set only.
    topk = scored.orderBy(F.desc("key_e9"), "doc_id").limit(_ARES_K)
    w = Window.orderBy(F.desc("key_e9"), "doc_id")
    return topk.withColumn("rn", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "lang", "w", "key_e9", "rn"
    )


@register(
    "minhash_incremental_pairs",
    f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.*, band_key
  FROM sig, unnest([{_BANDS_SQL}]) AS u(band_key)
),
bb AS (SELECT * FROM banded WHERE doc_id % 20 = 0),
cb AS (SELECT * FROM banded WHERE doc_id % 20 <> 0)
SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id,
       CAST({_MATCH_SQL} AS INTEGER) AS n_matching
FROM bb a JOIN cb b USING (band_key)
WHERE {_MATCH_SQL} >= {_MIN_MATCHING}
""",
)
def minhash_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest text dedup: LSH candidates between a 5%
    incoming batch (doc_id % 20 == 0) and the standing corpus —
    batch × corpus band probes ONLY, never corpus × corpus
    (operators.dedup.minhash_incremental_pairs). The corpus's banded
    signature table is the persistent index (bucketable by band_key
    → exchange-free probes); the batch side broadcasts. Per-batch
    cost is O(batch × collisions) regardless of corpus size — the
    text twin of embedding_crossdup's batch-broadcast GEMM."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_k=5
    ).localCheckpoint(eager=False)
    batch = sigs.where(F.col("doc_id") % 20 == 0)
    corpus = sigs.where(F.col("doc_id") % 20 != 0)
    return D.minhash_incremental_pairs(
        corpus,
        batch,
        "doc_id",
        n_hashes=_N_HASHES,
        band_size=2,
        min_matching=_MIN_MATCHING,
    )


_RP_OUT_DIM = 16
_RP_IN_DIM = 64


@register(
    "random_projection_reduce",
    f"""
WITH dims AS (
  SELECT vec_id, g.d AS d, CAST(embedding[g.d + 1] AS DOUBLE) AS val
  FROM embeddings,
       (SELECT unnest(generate_series(0, {_RP_IN_DIM - 1})) AS d) g
),
proj AS (
  SELECT d.vec_id, o.j,
         CAST(SUM(CAST(d.val * (CASE WHEN
             CAST(('0x' || substr(md5('rp|' || d.d || '|' || o.j), 1, 8))
               AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)
           AS DECIMAL(18,8))) AS DOUBLE) AS comp
  FROM dims d,
       (SELECT unnest(generate_series(0, {_RP_OUT_DIM - 1})) AS j) o
  GROUP BY d.vec_id, o.j
)
SELECT vec_id,
       CAST(COUNT(*) AS BIGINT) AS out_dim,
       CAST(SUM(CAST(floor(comp * comp * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) AS norm_sq_e6
FROM proj
GROUP BY vec_id
""",
)
def random_projection_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64→16 with a
    deterministic ±1 sign-hash projection matrix (Achlioptas sparse
    JL: entries ±1 drawn from md5('rp|d|j') — no stored matrix, any
    executor derives any entry, which is what makes the projection a
    zero-coordination map at 100 TB). Each output component is an
    exact fixed-point sum over the 64 input dims, and the
    gate-visible summary (per-vector output norm², integer
    micro-units) pins every component through the sum of squares.

    Scale notes, all MEASURED at sf0.1 (noop-write action):
    - 16 per-row higher-order decimal folds (no explode, no
      exchange) bench 2× slower than explode+groupBy — aggregate()
      lambdas over decimals evaluate interpreted per element.
    - The previous shape (explode × broadcast-16-j crossJoin,
      decimal SUM per (vec_id, j)) cost 3.8 s: one md5 per
      (row, d, j) — 16 per exploded row — and DECIMAL sum buffers,
      which fall off Tungsten's vectorized hash-agg fast path.
    - This shape: 0.96 s. The sign matrix is materialized ONCE as a
      broadcast 64-row × 16-column table (1024 md5 calls total, not
      per data row); each exploded row casts its value to
      decimal(18,8) micro-units exactly once and the 16 component
      sums are then BIGINT aggregations — vectorized hash agg end
      to end, one shuffle keyed on vec_id carrying 16 bigint
      partials. Bit-identical to the decimal-sum formulation
      (verified value-for-value at sf0.001/0.01/0.1): the per-value
      rounding still goes through the same double→decimal(18,8)
      cast, and the exact bigint sum (≤ 6.4e9 « 2^53) divided by
      1e8 in double rounds once, same as the decimal→double cast.
      The oracle SQL keeps the decimal formulation."""
    emb = load(spark, sf_dir, "embeddings")
    signs = spark.range(_RP_IN_DIM).select(F.col("id").alias("d"))
    signs = signs.select(
        "d",
        *[
            F.when(
                F.expr(
                    "CAST(conv(substr(md5(concat('rp|', CAST(d AS STRING),"
                    f" '|{j}')), 1, 8), 16, 10) AS BIGINT) % 2 = 0"
                ),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias(f"s{j}")
            for j in range(_RP_OUT_DIM)
        ],
    )
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "valf")
    ).select(
        "vec_id",
        F.col("d").cast("bigint").alias("d"),
        # Micro-units via the decimal(18,8) cast so per-value rounding
        # is identical to summing decimals directly.
        F.expr(
            "cast(cast(cast(valf as double) as decimal(18,8))"
            " * 100000000 as bigint)"
        ).alias("u"),
    )
    comp = (
        dims.join(F.broadcast(signs), "d")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(F.col("u") * F.col(f"s{j}")).alias(f"b{j}")
                for j in range(_RP_OUT_DIM)
            ]
        )
    )
    norm = None
    for j in range(_RP_OUT_DIM):
        c = F.col(f"b{j}").cast("double") / F.lit(100000000.0)
        term = F.floor(c * c * 1000000.0 + 0.5).cast("bigint")
        norm = term if norm is None else norm + term
    return comp.select(
        "vec_id",
        F.lit(_RP_OUT_DIM).cast("bigint").alias("out_dim"),
        norm.cast("bigint").alias("norm_sq_e6"),
    )


# ──────────────────── HTML boilerplate stripping ─────────────────

# The corpus is plain text, so (as with pii_redact's fake contacts) a
# deterministic HTML wrapper is synthesized first; the strip/measure
# expressions are the real operator under test. Script/style bodies
# contain no '<', so [^<]* matches them without dotall — Java regex
# and RE2 agree on everything used here.
_HTML_RAW_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><style>p{margin:0}</style></head><body>"
    "<nav>home | about &amp; contact</nav><p>' || text || "
    "'</p><a href=\"https://site.example/' || CAST(doc_id AS VARCHAR) || "
    "'\">' || substr(text, 1, 20) || '</a>"
    "<script>track(' || CAST(doc_id AS VARCHAR) || ');</script></body></html>'"
)

_HTML_A_TEXT = r"<a [^>]*>([^<]*)</a>"


# pround_sql so the oracle's IEEE expression tree matches the Spark
# side's pround exactly: DIVIDE FIRST, then scale. The former
# diff*1e6/len order diverges from diff/len*1e6 by 1 ulp on 42
# concrete integer pairs in the realistic length range — enough to
# flip the floor and fail the value-hash gate (round-9 review).
_HTML_MR_SQL = pround_sql(
    "(length(raw_html) - length(clean_text))"
    " / CAST(length(raw_html) AS DOUBLE)",
    6,
)
_HTML_LD_SQL = pround_sql(
    "link_chars / CAST(length(clean_text) AS DOUBLE)", 6
)


@register(
    "html_boilerplate_strip",
    f"""
WITH raw AS (
  SELECT doc_id, {_HTML_RAW_SQL} AS raw_html FROM documents
),
stripped AS (
  SELECT doc_id, raw_html,
         length(regexp_extract(raw_html, '{_HTML_A_TEXT}', 1)) AS link_chars,
         trim(regexp_replace(regexp_replace(replace(
             regexp_replace(regexp_replace(raw_html,
                 '<script[^>]*>[^<]*</script>', ' ', 'g'),
                 '<style[^>]*>[^<]*</style>', ' ', 'g'),
             '&amp;', '&'),
             '<[^>]+>', ' ', 'g'),
             '  +', ' ', 'g')) AS clean_text
  FROM raw
)
SELECT doc_id,
       length(raw_html) AS raw_chars,
       length(clean_text) AS clean_chars,
       link_chars,
       {_HTML_MR_SQL} AS markup_ratio,
       {_HTML_LD_SQL} AS link_density,
       ({_HTML_MR_SQL} > 0.5 OR {_HTML_LD_SQL} > 0.3) AS is_boilerplate,
       clean_text
FROM stripped
""",
)
def html_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup removal + boilerplate signals, fully in-engine: drop
    script/style blocks, decode entities, strip tags, collapse
    whitespace — then measure markup_ratio (non-content share of raw
    bytes) and link_density (anchor-text share of cleaned text), the
    two classic boilerplate detectors (trafilatura/jusText use the
    same signals). All regexp projection inside whole-stage codegen:
    no UDF, no shuffle, linear in input splits at any scale — the
    shape a 100 TB Common-Crawl-style cleaning pass needs."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style></head><body>"),
        F.lit("<nav>home | about &amp; contact</nav><p>"),
        F.col("text"),
        F.lit('</p><a href="https://site.example/'),
        F.col("doc_id").cast("string"),
        F.lit('">'),
        F.substring(F.col("text"), 1, 20),
        F.lit("</a><script>track("),
        F.col("doc_id").cast("string"),
        F.lit(");</script></body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            raw, r"<script[^>]*>[^<]*</script>", " "
                        ),
                        r"<style[^>]*>[^<]*</style>",
                        " ",
                    ),
                    F.lit("&amp;"),
                    F.lit("&"),
                ),
                r"<[^>]+>",
                " ",
            ),
            r"  +",
            " ",
        )
    )
    out = docs.select(
        "doc_id",
        F.length(raw).alias("raw_chars"),
        F.length(clean).alias("clean_chars"),
        F.length(F.regexp_extract(raw, _HTML_A_TEXT, 1)).alias("link_chars"),
        clean.alias("clean_text"),
    )
    mr = pround(
        (F.col("raw_chars") - F.col("clean_chars"))
        / F.col("raw_chars").cast("double"),
        6,
    )
    ld = pround(F.col("link_chars") / F.col("clean_chars").cast("double"), 6)
    return out.select(
        "doc_id",
        "raw_chars",
        "clean_chars",
        "link_chars",
        mr.alias("markup_ratio"),
        ld.alias("link_density"),
        ((mr > 0.5) | (ld > 0.3)).alias("is_boilerplate"),
        "clean_text",
    )
