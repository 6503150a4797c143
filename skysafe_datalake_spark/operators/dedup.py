"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — each built
from shuffles that scale: shingle explosion is reduced by map-side
combine before any exchange, candidate generation is an equi-join on
band/bucket keys (never an all-pairs cross join), and verification
runs only on candidate pairs.

Hash functions are md5-derived (portable across engines for oracle
checking) rather than Spark's xxhash64 (engine-specific).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skysafe_datalake_spark.functions.text import char_shingles, words


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one canonical (min-id) row per
    key, with the duplicate count. Deterministic — unlike
    dropDuplicates, which keeps an arbitrary row."""
    return (
        df.select(key.alias("_key"), F.col(id_col))
        .groupBy("_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .drop("_key")
    )


def _hash16(col: Column) -> Column:
    """First 16 bits of md5 as a bigint (portable: DuckDB twin is
    CAST('0x' || substr(md5(x),1,4) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("bigint")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash signatures over character shingles.

    For permutation i, sig_i = min over shingles of md5(i || '|' || s)
    (lexicographic min over hex == numeric min — md5 hex has fixed
    width). Exploding shingles multiplies rows by ~|text|, but the
    groupBy's map-side partial aggregation collapses them back to one
    n_hashes-wide row per document before the shuffle, so exchange
    volume is O(|docs| · n_hashes), independent of text length.
    """
    exploded = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_k)).alias("sh")
    ).dropDuplicates([id_col, "sh"])
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str,
    *,
    n_hashes: int = 8,
    band_size: int = 2,
    min_matching: int = 4,
) -> DataFrame:
    """LSH candidate pairs from MinHash signatures.

    Bands of ``band_size`` signature values are concatenated into
    bucket keys; documents sharing any band key become candidates
    (equi-join on the band key — the standard banding scheme, never
    an all-pairs comparison). Candidates are then scored by the
    number of matching signature components and kept when
    ``n_matching >= min_matching`` (estimated Jaccard ≥
    min_matching / n_hashes).
    """
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh{b * band_size + j}") for j in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), *[F.col(f"mh{i}") for i in range(n_hashes)], bands.alias("_bands")
    ).select(
        F.col(id_col),
        *[F.col(f"mh{i}") for i in range(n_hashes)],
        F.explode("_bands").alias("band_key"),
    )
    left = banded.select(
        F.col("band_key"),
        F.col(id_col).alias("a_id"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(n_hashes)],
    )
    right = banded.select(
        F.col("band_key"),
        F.col(id_col).alias("b_id"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(n_hashes)],
    )
    matching = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    return (
        left.join(right, ["band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", matching.alias("n_matching"))
        .dropDuplicates(["a_id", "b_id"])
        .filter(F.col("n_matching") >= min_matching)
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, *, n_bits: int = 16
) -> DataFrame:
    """SimHash fingerprint over word tokens (frequency-weighted).

    bit b of the fingerprint = 1 iff Σ_tokens (±1 per token, sign of
    bit b of md5(token)) > 0. Near-duplicate docs differ in few bits
    (compare with a Hamming-distance self-join on rotated keys).
    Two-level aggregation, both with partial combine.
    """
    tokens = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("tok")
    ).withColumn("h", _hash16(F.col("tok")))
    contrib = tokens.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
        F.col("h"),
    ).withColumn(
        "c",
        F.when(F.expr("(h >> CAST(bit AS INT)) & 1") == 1, 1).otherwise(-1),
    )
    bit_sums = contrib.groupBy(id_col, "bit").agg(F.sum("c").alias("s"))
    return bit_sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    |A∩B| via a self-equi-join on distinct shingles (shuffle keyed on
    shingle — skew-prone on stop-shingles; AQE skew-join splits hot
    keys), then Jaccard = |A∩B| / (|A|+|B|-|A∩B|). For 100 TB corpora
    run :func:`minhash_lsh_pairs` first and verify only candidates.
    """
    sh = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_k)).alias("sh")
    ).dropDuplicates([id_col, "sh"])
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.select(F.col(id_col).alias("a_id"), "sh")
        .join(sh.select(F.col(id_col).alias("b_id"), "sh"), ["sh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a_id"), F.col("n_sh").alias("a_n")), ["a_id"])
        .join(sizes.select(F.col(id_col).alias("b_id"), F.col("n_sh").alias("b_n")), ["b_id"])
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("a_n") + F.col("b_n") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
