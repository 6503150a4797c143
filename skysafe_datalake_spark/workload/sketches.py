"""Deterministic mergeable sketches (KMV, count-min, histogram quantiles).

At 100 TB you estimate cardinalities, frequencies, and quantiles with
sketches, not exact aggregations. Spark's built-ins
(approx_count_distinct's HyperLogLog++, count_min_sketch,
approx_percentile) are real but their binary state / interpolation is
engine-specific, so a DuckDB oracle can't verify them. These
operators implement the sketch algorithms from scratch on PORTABLE
primitives — md5 hashing and integer bin math, which both engines
compute identically — so the driver gate hash-checks the full sketch
math end to end:

- KMV (k-minimum-values): keep the k smallest hash values per group;
  distinct-count estimate = (k-1) / fraction-of-hash-space covered.
  Mergeable (union = k smallest of the union), one shuffle per group.
- Count-min: d independent hash rows × w buckets of counters;
  frequency estimate = min over rows of the hit bucket. The sketch
  is a fixed d·w-cell table no matter the input size, built with one
  map-side-combined aggregation.
- Histogram quantiles: fixed equi-width bin counts per group;
  quantile estimate = midpoint of the first bin covering the
  ceil(q·n) rank. Counts merge by addition — the streaming/partial
  aggregation shape exact percentiles can never have.

All use integer arithmetic after hashing/binning (plus fixed IEEE
estimate expressions), so results are bit-identical on any
partitioning and against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skysafe_datalake_spark.plans.materialize import materialize_bounded
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.tables import load

_HEX = "0123456789abcdef"


def hex_int_sql(expr: str, n: int) -> str:
    """SQL for the first ``n`` hex digits of ``expr`` (a lowercase hex
    string) as a BIGINT — identical text works in Spark SQL and DuckDB
    (both expose ``instr(haystack, needle)`` with the same argument
    order). n ≤ 15 keeps the value < 16^15 < 2^63."""
    # Constants as BIGINT: Spark 4 runs ANSI mode, where INT·INT
    # overflows hard at 16^8 instead of widening.
    terms = [
        f"(instr('{_HEX}', substr({expr}, {i + 1}, 1)) - 1) * "
        f"CAST({16 ** (n - 1 - i)} AS BIGINT)"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


# ───────────────────────── KMV distinct sketch ───────────────────

_KMV_K = 32
_KMV_DIGITS = 12  # hash space = 16^12
_KMV_SPACE = 16**_KMV_DIGITS

_KMV_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT lang, {hex_int_sql('md5(text)', _KMV_DIGITS)} AS h
  FROM documents
),
ranked AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_hashes
  FROM hashes
),
exact AS (
  SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
  FROM documents GROUP BY lang
)
SELECT e.lang,
       e.exact_distinct,
       MAX(CASE WHEN r.rn = {_KMV_K} THEN r.h END) AS kth_hash,
       CAST(COALESCE(
         ({_KMV_K} - 1) * CAST({_KMV_SPACE} AS BIGINT)
           // MAX(CASE WHEN r.rn = {_KMV_K} THEN r.h END),
         MIN(r.n_hashes)) AS BIGINT) AS kmv_estimate
FROM exact e
JOIN ranked r ON r.lang = e.lang
WHERE r.rn <= {_KMV_K}
GROUP BY e.lang, e.exact_distinct
"""


@register("kmv_distinct_sketch", _KMV_SQL)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-document estimate via a K-minimum-values
    sketch (k=32) over md5, next to the exact count for error
    inspection. Groups with fewer than k distinct hashes fall back to
    their exact hash count (the KMV rule: a non-full sketch IS
    exact). Estimate = (k−1)·|space| / h_k in pure integer math.

    Scale shape: the per-group k-smallest selection is a row_number
    window — at cluster scale the same sketch is built as a proper
    partial aggregate (per-partition top-k arrays merged
    associatively), which this formulation's DISTINCT+window plan
    already approximates with one shuffle on lang; the estimate
    itself touches k rows per group. The exact COUNT(DISTINCT) rides
    along only as the quality reference."""
    docs = load(spark, sf_dir, "documents")
    hashes = docs.select(
        "lang", F.expr(hex_int_sql("md5(text)", _KMV_DIGITS)).alias("h")
    ).distinct()
    w = Window.partitionBy("lang").orderBy("h")
    ranked = hashes.select(
        "lang",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).cast("bigint").alias(
            "n_hashes"
        ),
    ).where(F.col("rn") <= _KMV_K)
    exact = docs.groupBy("lang").agg(
        F.countDistinct("text").cast("bigint").alias("exact_distinct")
    )
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("h")))
    return (
        exact.join(ranked, "lang")
        .groupBy("lang", "exact_distinct")
        .agg(
            kth.alias("kth_hash"),
            F.coalesce(
                F.expr(
                    f"(({_KMV_K} - 1) * cast({_KMV_SPACE} as bigint))"
                    f" div max(case when rn = {_KMV_K} then h end)"
                ),
                F.min("n_hashes"),
            )
            .cast("bigint")
            .alias("kmv_estimate"),
        )
        .select("lang", "exact_distinct", "kth_hash", "kmv_estimate")
    )


# ───────────────────────── count-min sketch ──────────────────────

_CMS_D = 3  # hash rows
_CMS_W = 128  # buckets per row
_CMS_DIGITS = 8
_CMS_TOP = 15


def _cms_bucket_sql(digest_expr: str, row: int) -> str:
    """Row ``row``'s bucket from ONE md5 digest per token: each of the
    d rows reads its own disjoint 8-hex-digit slice of the digest —
    independent coordinates at a third of the hashing cost."""
    h = hex_int_sql(
        f"substr({digest_expr}, {row * _CMS_DIGITS + 1}, {_CMS_DIGITS})",
        _CMS_DIGITS,
    )
    return f"({h} % {_CMS_W})"


_CMS_ROWS_UNION = "\nUNION ALL\n".join(
    f"SELECT word, {r} AS rid, {_cms_bucket_sql('h', r)} AS bucket FROM hashed"
    for r in range(_CMS_D)
)

_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
hashed AS (
  SELECT word, md5(word) AS h FROM toks
),
cells AS (
  SELECT rid, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({_CMS_ROWS_UNION}) coords
  GROUP BY rid, bucket
),
exact AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY word
),
top AS (
  SELECT word, exact_cnt, md5(word) AS h FROM exact
  ORDER BY exact_cnt DESC, word LIMIT {_CMS_TOP}
),
lookups AS (
  {_CMS_ROWS_UNION.replace("FROM hashed", "FROM top")}
)
SELECT t.word, t.exact_cnt, MIN(c.cnt) AS cms_cnt
FROM top t
JOIN lookups l ON l.word = t.word
JOIN cells c ON c.rid = l.rid AND c.bucket = l.bucket
GROUP BY t.word, t.exact_cnt
"""


@register("countmin_heavyhitters", _CMS_SQL)
def countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (d=3 rows × w=128 buckets) over the
    corpus token stream, read back for the true top-15 tokens next to
    their exact counts (CMS guarantees estimate ≥ exact; collisions
    only inflate). Hash row r of token t = hex digits [8r, 8r+8) of
    md5(t) mod w — one digest per token, d independent slices,
    portable across engines.

    Scale shape (r14): ONE pass over the token stream — the exact
    word aggregation (map-side combine to per-partition vocabularies)
    — feeds both consumers: the top-k, and the sketch cells, which
    fold the per-word counts into at most d·w = 384 cells (cnt per
    cell = Σ exact_cnt of the words hashing there — the same bigint
    total as counting tokens directly, since every occurrence of a
    word lands in the same d cells). md5 runs per vocabulary row, not
    per token. The sketch stays associatively mergeable — streaming
    micro-batches can add cell counts. Token explosion is per-row
    array code, zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    exact = toks.groupBy("word").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    # The sketch cells derive from the EXACT word counts (r14, guide
    # §2.3/§2.4): cnt(rid, bucket) = Σ exact_cnt over words hashing
    # into the bucket — identical bigint sums to counting the token
    # stream directly, because every occurrence of a word lands in
    # the same d cells. This folds the former second full token pass
    # into the word aggregation both consumers need anyway (the
    # corpus is scanned/exploded ONCE, and md5 runs per VOCABULARY
    # row instead of per token). Each word emits its d (row, bucket)
    # coordinates from disjoint slices of a single digest via one
    # exploded array — no d-way UNION re-scanning the input.
    # Interleaved A/B at sf0.1 (min-of-5): 1.92 → 0.59 s,
    # md5-identical.
    coords = ", ".join(
        f"struct({r} AS rid, {_cms_bucket_sql('h', r)} AS bucket)"
        for r in range(_CMS_D)
    )
    cells = (
        exact.select(F.md5("word").alias("h"), "exact_cnt")
        .select("exact_cnt", F.expr(f"inline(array({coords}))"))
        .groupBy("rid", "bucket")
        .agg(F.sum("exact_cnt").cast("bigint").alias("cnt"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), "word").limit(_CMS_TOP)
    # The d lookup coordinates come from ONE inline-exploded array on
    # the top-k rows, carrying exact_cnt through — a per-row unionAll
    # of the same subplan would re-plan the top-k (and its full
    # corpus aggregation underneath) once per CMS row, and the extra
    # copies plan as global sort-limit fallbacks instead of
    # TakeOrderedAndProject (caught by tools/plan_audit.py: 4 corpus
    # scans and 3 global sorts where 1 TopK suffices).
    lookup_coords = ", ".join(
        f"struct({r} AS rid, {_cms_bucket_sql('h', r)} AS bucket)"
        for r in range(_CMS_D)
    )
    return (
        top.withColumn("h", F.md5("word"))
        .select("word", "exact_cnt", F.expr(f"inline(array({lookup_coords}))"))
        .join(F.broadcast(cells), ["rid", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
        .select("word", "exact_cnt", "cms_cnt")
    )


# ───────────────── mergeable histogram quantiles ─────────────────

_HQ_BINS = 256

_HQ_SQL = f"""
WITH bounds AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
  FROM lineitem
),
binned AS (
  SELECT l_returnflag AS flag,
         CAST(least({_HQ_BINS - 1},
           floor((l_extendedprice - lo) * {_HQ_BINS}.0 / (hi - lo)))
           AS BIGINT) AS b
  FROM lineitem, bounds
),
cells AS (
  SELECT flag, b, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY flag, b
),
cum AS (
  SELECT flag, b, c,
         CAST(SUM(c) OVER (PARTITION BY flag ORDER BY b) AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n
  FROM cells
),
picked AS (
  SELECT flag, MIN(n) AS n,
         MIN(CASE WHEN cc >= (n + 1) // 2 THEN b END) AS b50,
         MIN(CASE WHEN cc >= (19 * n + 19) // 20 THEN b END) AS b95
  FROM cum GROUP BY flag
),
exact AS (
  SELECT l_returnflag AS flag,
         quantile_cont(l_extendedprice, [0.5, 0.95]) AS qs
  FROM lineitem GROUP BY l_returnflag
)
SELECT p.flag, p.n, p.b50, p.b95,
       bounds.lo + (CAST(p.b50 AS DOUBLE) + 0.5) * (bounds.hi - bounds.lo)
         / {_HQ_BINS}.0 AS p50_est,
       bounds.lo + (CAST(p.b95 AS DOUBLE) + 0.5) * (bounds.hi - bounds.lo)
         / {_HQ_BINS}.0 AS p95_est,
       floor(e.qs[1] * 1000000.0 + 0.5) / 1000000.0 AS p50_exact,
       floor(e.qs[2] * 1000000.0 + 0.5) / 1000000.0 AS p95_exact
FROM picked p
JOIN exact e ON e.flag = p.flag
CROSS JOIN bounds
"""


@register("histogram_quantile_sketch", _HQ_SQL)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed 256-bin equi-width histogram —
    the mergeable-sketch answer to percentiles at scale (exact
    quantiles need a global sort or a full value multiset per group;
    a histogram is a few hundred integers, mergeable by addition,
    buildable map-side, and streamable). Per group: bin counts →
    running cumulative → first bin covering the ceil(q·n) rank →
    midpoint estimate, with the exact continuous percentile alongside
    as the error reference. Bin selection and rank thresholds are
    pure integer math ((n+1)//2, (19n+19)//20), the two estimate
    expressions are fixed IEEE trees over (lo, hi, bin) — so the
    whole sketch is bit-reproducible against the oracle.

    Scale shape: one aggregation to (group × ≤256) cells, a window
    over ≤256 rows per group, a 1-row bounds broadcast. The exact
    reference column is the only part that wouldn't survive 100 TB —
    it exists to expose the sketch's error, not to compute it."""
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    # Materialize the 1-row bounds ONCE (lazy persist — see
    # plans/materialize.py for the localCheckpoint-vs-persist
    # tradeoff): its two broadcast sites (binning + final de-binning)
    # each re-ran the full min/max scan without this cut.
    bounds = materialize_bounded(bounds)
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.col("l_returnflag").alias("flag"),
        F.least(
            F.lit(_HQ_BINS - 1),
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                * F.lit(float(_HQ_BINS))
                / (F.col("hi") - F.col("lo"))
            ),
        )
        .cast("bigint")
        .alias("b"),
    )
    cells = binned.groupBy("flag", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("flag").orderBy("b")
    wall = Window.partitionBy("flag")
    cum = cells.select(
        "flag",
        "b",
        F.sum("c").over(wcum).cast("bigint").alias("cc"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    picked = cum.groupBy("flag").agg(
        F.min("n").alias("n"),
        F.min(F.when(F.col("cc") >= F.expr("(n + 1) div 2"), F.col("b"))).alias(
            "b50"
        ),
        F.min(
            F.when(F.col("cc") >= F.expr("(19 * n + 19) div 20"), F.col("b"))
        ).alias("b95"),
    )
    exact = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("q50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("q95"),
    )
    est = lambda b: F.col("lo") + (  # noqa: E731
        F.col(b).cast("double") + F.lit(0.5)
    ) * (F.col("hi") - F.col("lo")) / F.lit(float(_HQ_BINS))
    return (
        picked.join(exact, "flag")
        .crossJoin(F.broadcast(bounds))
        .select(
            "flag",
            "n",
            "b50",
            "b95",
            est("b50").alias("p50_est"),
            est("b95").alias("p95_est"),
            (F.floor(F.col("q50") * 1000000.0 + 0.5) / 1000000.0).alias(
                "p50_exact"
            ),
            (F.floor(F.col("q95") * 1000000.0 + 0.5) / 1000000.0).alias(
                "p95_exact"
            ),
        )
    )


# ──────────────────── HyperLogLog distinct sketch ────────────────

# Spark's approx_count_distinct IS HyperLogLog++, but its binary
# register state and bias tables are engine-internal, so an oracle
# can't check it. This is the classic Flajolet HLL on portable
# primitives: p=8 → m=256 registers addressed by the first two hex
# digits of md5, rho = 1 + leading-zero-bits of the next 24 hash
# bits, harmonic mean in scaled-integer arithmetic (sums of 2^k are
# exact BIGINTs, immune to float summation order), and the standard
# linear-counting fallback for the small range — rounded to a whole
# integer so both engines agree bit-for-bit.

_HLL_M = 256  # registers (p = 8)
_HLL_BITS = 24  # rho bits per hash → rho ∈ 1..25
_HLL_EMPTY = 2**_HLL_BITS * 2  # 2^25: an empty register's 2^(25-0)
# alpha_256 = 0.7213/(1 + 1.079/256), fixed-point at 1e-6.
_HLL_ALPHA_1E6 = 718273
# Raw-estimate numerator: alpha·m²·2^25, pre-multiplied by 1e6.
_HLL_NUMER = _HLL_ALPHA_1E6 * _HLL_M * _HLL_M * 2**_HLL_BITS * 2
_HLL_SMALL = 5 * _HLL_M // 2  # below this, prefer linear counting


def _bitlen_sql(expr: str, bits: int) -> str:
    """Portable integer bit-length: count of k in [0, bits) with
    ``expr`` >= 2^k. Pure comparisons — identical in any engine."""
    terms = [
        f"(CASE WHEN {expr} >= {2 ** k} THEN 1 ELSE 0 END)"
        for k in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


_HLL_SQL = f"""
WITH coords AS (
  SELECT lang,
         {hex_int_sql("substr(md5(text), 1, 2)", 2)} AS reg,
         {hex_int_sql("substr(md5(text), 3, 6)", 6)} AS v
  FROM documents
),
regs AS (
  SELECT lang, reg,
         MAX({_HLL_BITS + 1} - {_bitlen_sql('v', _HLL_BITS)}) AS m_r
  FROM coords GROUP BY lang, reg
),
agg AS (
  SELECT lang,
         CAST(SUM(CAST(power(2, {_HLL_BITS + 1} - m_r) AS BIGINT))
           AS BIGINT) AS s_present,
         CAST(COUNT(*) AS BIGINT) AS n_registers
  FROM regs GROUP BY lang
),
est AS (
  SELECT lang, n_registers,
         CAST({_HLL_NUMER} AS BIGINT)
           // (s_present + ({_HLL_M} - n_registers)
               * CAST({_HLL_EMPTY} AS BIGINT))
           // 1000000 AS raw_est
  FROM agg
),
exact AS (
  SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
  FROM documents GROUP BY lang
)
SELECT e.lang, e.exact_distinct, t.n_registers,
       CAST(t.raw_est AS BIGINT) AS hll_raw,
       CAST(CASE
         WHEN t.raw_est < {_HLL_SMALL} AND t.n_registers < {_HLL_M}
         THEN CAST(floor({_HLL_M} * ln({_HLL_M}.0
                / ({_HLL_M} - t.n_registers)) + 0.5) AS BIGINT)
         ELSE t.raw_est
       END AS BIGINT) AS hll_estimate
FROM exact e
JOIN est t ON t.lang = e.lang
"""


@register("hll_distinct_sketch", _HLL_SQL)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-document estimate via a from-scratch
    HyperLogLog (m=256 registers) next to the exact count: register =
    first 8 md5 bits, rho = 1 + leading zeros of the next 24 bits
    (computed as a portable comparison-count bit-length, no engine
    clz), registers combine by MAX, the harmonic mean runs in scaled
    integers (Σ 2^(25-M_j) is an exact BIGINT — float summation
    order can't perturb it), and the small-range linear-counting
    fallback (m·ln(m/V), rounded to a whole count) kicks in below
    2.5·m when empty registers remain. Parity with the reference's
    cardinality estimation (SURVEY §2.4) with oracle-checkable state.

    Scale shape: duplicates are absorbed by MAX(rho) — no DISTINCT
    pre-pass, so the build is ONE aggregation with map-side combine
    to ≤ m rows per group, then a ≤ m-row fold. The register table
    is associatively mergeable (MAX), so micro-batches / partitions
    union for free; this is exactly how approx_count_distinct
    scales, with the state auditable. The exact COUNT(DISTINCT)
    rides along only as the quality reference."""
    docs = load(spark, sf_dir, "documents")
    coords = docs.select(
        "lang",
        F.expr(hex_int_sql("substr(md5(text), 1, 2)", 2)).alias("reg"),
        F.expr(hex_int_sql("substr(md5(text), 3, 6)", 6)).alias("v"),
    )
    regs = coords.groupBy("lang", "reg").agg(
        F.max(
            F.lit(_HLL_BITS + 1) - F.expr(_bitlen_sql("v", _HLL_BITS))
        ).alias("m_r")
    )
    agg = regs.groupBy("lang").agg(
        F.sum(
            F.expr(f"cast(power(2, {_HLL_BITS + 1} - m_r) as bigint)")
        )
        .cast("bigint")
        .alias("s_present"),
        F.count("*").cast("bigint").alias("n_registers"),
    )
    est = agg.select(
        "lang",
        "n_registers",
        F.expr(
            f"cast({_HLL_NUMER} as bigint)"
            f" div (s_present + ({_HLL_M} - n_registers)"
            f" * cast({_HLL_EMPTY} as bigint)) div 1000000"
        ).alias("raw_est"),
    )
    exact = docs.groupBy("lang").agg(
        F.countDistinct("text").cast("bigint").alias("exact_distinct")
    )
    lin = F.floor(
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("n_registers")))
        + F.lit(0.5)
    ).cast("bigint")
    return (
        exact.join(est, "lang")
        .select(
            "lang",
            "exact_distinct",
            "n_registers",
            F.col("raw_est").cast("bigint").alias("hll_raw"),
            F.when(
                (F.col("raw_est") < _HLL_SMALL)
                & (F.col("n_registers") < _HLL_M),
                lin,
            )
            .otherwise(F.col("raw_est"))
            .cast("bigint")
            .alias("hll_estimate"),
        )
    )


# ──────────────────── KMV set-operation estimates ────────────────

_KSO_K = 32
_KSO_DIGITS = 12
_KSO_SPACE = 16**_KSO_DIGITS

_KSO_SQL = f"""
WITH toks AS (
  SELECT CASE WHEN length(source) = 4 THEN 'A' ELSE 'B' END AS corpus,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
items AS (
  SELECT DISTINCT corpus, {hex_int_sql("md5(bigram)", _KSO_DIGITS)} AS h
  FROM (
    SELECT corpus,
           unnest(list_transform(generate_series(1, len(ts) - 1),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS bigram
    FROM toks WHERE len(ts) >= 2
  )
),
sk AS (
  SELECT corpus, h
  FROM (SELECT corpus, h,
               row_number() OVER (PARTITION BY corpus ORDER BY h) AS rn
        FROM items)
  WHERE rn <= {_KSO_K}
),
u AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sk)
),
flags AS (
  SELECT u.h, u.rn,
         MAX(CASE WHEN sk.corpus = 'A' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN sk.corpus = 'B' THEN 1 ELSE 0 END) AS in_b
  FROM u JOIN sk ON sk.h = u.h
  WHERE u.rn <= {_KSO_K}
  GROUP BY u.h, u.rn
),
est AS (
  SELECT CAST(COALESCE(
           ({_KSO_K} - 1) * CAST({_KSO_SPACE} AS BIGINT)
             // MAX(CASE WHEN rn = {_KSO_K} THEN h END),
           COUNT(*)) AS BIGINT) AS est_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS k_both,
         CAST(COUNT(*) AS BIGINT) AS merged_count
  FROM flags
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(CASE WHEN n_corpora = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_intersection
  FROM (SELECT h, COUNT(DISTINCT corpus) AS n_corpora FROM items GROUP BY h)
)
SELECT e.est_union,
       CAST(e.k_both * e.est_union
              // GREATEST(1, LEAST({_KSO_K}, e.merged_count))
            AS BIGINT) AS est_intersection,
       e.k_both,
       x.exact_union,
       x.exact_intersection
FROM est e CROSS JOIN exact x
"""


@register("kmv_set_ops", _KSO_SQL)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / intersection cardinality estimates across two corpora
    from their KMV sketches alone — the mergeability property that
    makes KMV the sketch for cross-dataset overlap questions ("how
    much does crawl B add over crawl A?") without ever co-shuffling
    the raw sets. Corpus A = sources src0-9, B = src10-19; items are
    distinct lowercased token bigrams.

    Estimators (Beyer et al., SIGMOD'07): the k smallest of
    sketch(A) ∪ sketch(B) IS the KMV sketch of A ∪ B, so
    |A∪B| ≈ (k−1)·|space|/h_k on the merged sketch (a non-full merged
    sketch is the exact union); Jaccard ≈ |both-flagged|/|merged
    sketch| over the merged sketch's min(k, merged-size) elements,
    and |A∩B| = J·|A∪B| in integer math. Dividing by the MERGED
    sketch size (not the fixed k) keeps the documented invariant
    that a non-full merged sketch yields the EXACT intersection:
    est_union collapses to merged_count there, so the ratio
    k_both·merged_count/merged_count = k_both = exact overlap.
    The exact union/intersection ride along as quality references.

    Scale shape: everything after the two per-corpus k-smallest
    selections (one shuffle on corpus, same as kmv_distinct_sketch)
    touches ≤ 2k rows — the global windows and joins in the estimate
    stage run on ≤ 64 rows by construction, which is the entire point
    of sketch-merge set algebra at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.length("source") == 4, F.lit("A")).otherwise(F.lit("B")).alias(
            "corpus"
        ),
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
        ).alias("ts"),
    ).where(F.size("ts") >= 2)
    items = (
        toks.select(
            "corpus",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> concat(ts[i-1], ' ', ts[i]))"
                )
            ).alias("bigram"),
        )
        .select(
            "corpus",
            F.expr(hex_int_sql("md5(bigram)", _KSO_DIGITS)).alias("h"),
        )
        .distinct()
    )
    sk = (
        items.withColumn(
            "rn", F.row_number().over(Window.partitionBy("corpus").orderBy("h"))
        )
        .where(F.col("rn") <= _KSO_K)
        .select("corpus", "h")
    )
    # ≤ 2k = 64 rows from here on: the single-partition window is
    # fine. The merge is ONE linear chain over sk (group the ≤2k
    # sketch rows by hash for the per-corpus membership flags, THEN
    # rank the distinct hashes and keep the k smallest) — the
    # equivalent rank-the-distinct-hashes-then-join-back-to-sk
    # formulation consumes sk twice, and each consumer re-runs the
    # full corpus tokenize + distinct + per-corpus top-k (exchange
    # reuse does not collapse the duplicated subtrees), paying one
    # whole corpus pass for nothing at any scale. The exact-reference
    # branch keeps its own pass by design (it needs every distinct
    # hash, not the sketch).
    flags = (
        sk.groupBy("h")
        .agg(
            F.max(F.when(F.col("corpus") == "A", 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("corpus") == "B", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .where(F.col("rn") <= _KSO_K)
    )
    est = flags.agg(
        F.coalesce(
            F.expr(
                f"(({_KSO_K} - 1) * cast({_KSO_SPACE} as bigint))"
                f" div max(case when rn = {_KSO_K} then h end)"
            ),
            F.count(F.lit(1)),
        )
        .cast("bigint")
        .alias("est_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("k_both"),
        F.count(F.lit(1)).cast("bigint").alias("merged_count"),
    )
    exact = (
        items.groupBy("h")
        .agg(F.countDistinct("corpus").alias("n_corpora"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum(F.when(F.col("n_corpora") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("exact_intersection"),
        )
    )
    return est.crossJoin(exact).select(
        "est_union",
        F.expr(
            "cast(k_both * est_union"
            f" div greatest(1, least({_KSO_K}, merged_count)) as bigint)"
        ).alias("est_intersection"),
        "k_both",
        "exact_union",
        "exact_intersection",
    )
