"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
variant (random-hyperplane signatures) as the 100 TB scale path.
Vector math uses higher-order functions (zip_with/aggregate) — JVM
expressions, no Python in the loop.
"""

from __future__ import annotations

import sys

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential left-to-right sum
    — deterministic and oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec: str = "embedding",
    k: int = 5,
    order_round: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query
    set against the corpus, rank per query.

    At scale this is the right baseline topology: the corpus stays
    partitioned in place, queries broadcast, and the window's shuffle
    carries only |queries|·|corpus| scored rows — avoid by using
    k=1 argmin or pre-filtering with :func:`lsh_bucket_candidates`.
    """
    from skysafe_datalake_spark.workload.tables import pround

    q = queries.select(F.col(query_id), F.col(vec).alias("_qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec).alias("_cv"))
    w = Window.partitionBy(query_id).orderBy(
        pround(F.col("cosine_raw"), order_round).desc(), F.col(corpus_id)
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine_raw", cosine(F.col("_qv"), F.col("_cv")))
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .select(query_id, corpus_id, "cosine_raw", F.col("_rnk").alias("rank"))
    )


def _gemm_block_pairs(
    left: DataFrame, bc, id_col: str, vec: str, threshold: float, scale: float,
    *, ordered_only: bool = True,
) -> DataFrame:
    """mapInPandas GEMM stage: each Arrow batch of ``left`` is scored
    against the broadcast normalized matrix ``bc = (ids, mat)``;
    emits (a_id, b_id, cosine) above threshold. ``ordered_only``
    keeps a_id < b_id (self near-dup: each unordered pair once);
    False emits every cross pair (disjoint id spaces)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def blocks(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        b_ids, b_mat = bc.value
        if b_mat.size == 0:
            return  # empty broadcast side -> zero pairs, not a GEMM crash
        for pdf in it:
            if len(pdf) == 0:  # np.stack needs at least one array
                continue
            a_ids = pdf[id_col].to_numpy(dtype="int64")
            a_mat = np.stack(pdf[vec].to_numpy()).astype("float64")
            a_norms = np.linalg.norm(a_mat, axis=1)
            a_norms[a_norms == 0] = 1.0
            sims = (a_mat / a_norms[:, None]) @ b_mat.T
            mask = sims > threshold
            if ordered_only:
                mask &= a_ids[:, None] < b_ids[None, :]
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ai],
                    "b_id": b_ids[bi],
                    "cosine": np.floor(sims[ai, bi] * scale + 0.5) / scale,
                }
            )

    return left.select(id_col, vec).mapInPandas(
        blocks, schema="a_id long, b_id long, cosine double"
    )


def cross_neardup_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    *,
    id_col: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """Incremental-corpus near-dup: which CORPUS vectors near-
    duplicate any vector of the (small) incoming BATCH — the check a
    training pipeline runs before admitting new documents.

    The batch is the broadcast side (it is micro-batch-sized by
    construction: ~0.5 GB per million 64-dim vectors is the ceiling),
    the corpus streams through the GEMM kernel in place — so at 100 TB
    the corpus is never shuffled, collected, or self-joined; cost is
    one scan · one BLAS matmul per Arrow batch. Emits
    (a_id=corpus id, b_id=batch id, cosine) above threshold.
    """
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(_collect_normalized(batch, id_col, vec))
    scale = float(10**round_digits)
    return _gemm_block_pairs(
        corpus, bc, id_col, vec, threshold, scale, ordered_only=False
    )


def _collect_normalized(df: DataFrame, id_col: str, vec: str):
    import numpy as np

    rows = df.select(id_col, vec).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    if not rows:
        # np.array([]) is 1-D and norm(axis=1) raises AxisError — an
        # empty micro-batch (cross_neardup_pairs in continuous ingest)
        # or an empty hash tile must mean zero pairs, not a crash.
        return ids, np.zeros((0, 0), dtype="float64")
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def block_neardup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.3,
    round_digits: int = 4,
    strategy: str = "auto",
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """All-pairs cosine near-dup via block matrix multiplication.

    Strategies (``auto`` counts the corpus and picks):

    ``gemm`` (corpus ≤ ``max_broadcast_rows``)
        The whole corpus is collected once and broadcast as a dense
        normalized numpy matrix (same memory contract as a broadcast
        hash join: ~0.5 GB per million 64-dim vectors); the left side
        streams through ``mapInPandas`` and each Arrow batch computes
        one BLAS GEMM block ``A_norm @ B_normᵀ`` instead of |A|·|B|
        interpreted per-pair expressions.

    ``tiled`` (anything larger)
        The corpus is hash-split into ⌈n / max_broadcast_rows⌉ tiles;
        each pass broadcasts ONE tile and GEMMs the full corpus
        against it. Driver/executor memory stays bounded by the tile
        while the result is still the exact all-pairs answer (each
        unordered pair is produced exactly once, in the tile owning
        its larger id). Work remains inherently O(n²/batch) — at true
        100 TB scale use the sub-quadratic candidate generators
        (:func:`lsh_bucket_candidates`, simhash/minhash in
        ``operators.dedup``) and keep this as their exact verifier.

    Emits (a_id, b_id, cosine) for a_id < b_id and cosine > threshold.
    """
    spark = emb.sparkSession
    scale = float(10**round_digits)

    n: int | None = None
    if strategy == "auto":
        n = emb.count()
        strategy = "gemm" if n <= max_broadcast_rows else "tiled"

    if strategy == "gemm":
        bc = spark.sparkContext.broadcast(
            _collect_normalized(emb, id_col, vec)
        )
        return _gemm_block_pairs(emb, bc, id_col, vec, threshold, scale)

    if strategy != "tiled":
        raise ValueError(f"unknown strategy {strategy!r}")

    if n is None:
        n = emb.count()
    n_tiles = max(1, -(-n // max_broadcast_rows))
    print(
        f"# block_neardup_pairs: tiled over {n_tiles} tiles"
        f" ({n} rows, {max_broadcast_rows} rows/tile)",
        file=sys.stderr,
    )
    tiles = emb.withColumn(
        "_tile", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_tiles)).cast("int")
    )
    out = None
    for t in range(n_tiles):
        tile_df = tiles.filter(F.col("_tile") == t).drop("_tile")
        bc = spark.sparkContext.broadcast(
            _collect_normalized(tile_df, id_col, vec)
        )
        # Materialize this pass before moving on so only ONE tile's
        # broadcast is ever live — a lazy union would pin all tiles
        # in memory at once, recreating the unbounded-broadcast bug
        # this strategy exists to prevent.
        part = _gemm_block_pairs(
            emb, bc, id_col, vec, threshold, scale
        ).localCheckpoint(eager=True)
        bc.unpersist()
        out = part if out is None else out.unionByName(part)
    return out


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec · plane_i).
    ``planes`` are deterministic pseudo-random unit vectors generated
    driver-side (seeded) and inlined as literals — tiny, broadcast-free.
    """
    bits = []
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                # one array Literal per plane (r13), not F.array of
                # |dim| literal nodes — same constant, but the
                # CreateArray form put dim x n_planes expression
                # nodes through analysis and rebuilt each array in
                # codegen (see bloom_semi_prune: 2.6x on its 1024-word
                # bitmap).
                F.lit([float(x) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ivf_assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec: str = "embedding",
    nprobe: int = 1,
    order_round: int = 6,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its ``nprobe``
    nearest coarse centroids (by cosine, deterministic tie-break on
    centroid id).

    ``centroids`` is a tiny (cell_id, vec) table — broadcast, so
    assignment is a map-side cross join + per-row window, no shuffle
    of the corpus itself beyond the rank. At index-build time the
    corpus uses nprobe=1 (each vector lives in exactly one inverted
    list); at query time nprobe>1 trades extra cells scanned for
    recall, exactly like FAISS's IVF nprobe knob.
    """
    from skysafe_datalake_spark.workload.tables import pround

    c = centroids.select(F.col("cell_id"), F.col(vec).alias("_cell_v"))
    w = Window.partitionBy(id_col).orderBy(
        pround(F.col("_cell_cos"), order_round).desc(), F.col("cell_id")
    )
    return (
        df.crossJoin(F.broadcast(c))
        .withColumn("_cell_cos", cosine(F.col(vec), F.col("_cell_v")))
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .drop("_cell_v", "_cell_cos")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    order_round: int = 6,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into inverted
    lists (one cell per vector), probe each query's ``nprobe``
    nearest cells, score exactly within probed cells only.

    Comparisons drop from |Q|·|C| to |Q|·(nprobe/n_cells)·|C| on
    average. The cell id is an equi-join key, so at 100 TB this is a
    shuffled hash join on cell (corpus side can even be written
    bucketed by cell_id, making the probe join shuffle-free); the
    per-query candidate set then ranks inside one window partition.
    """
    from skysafe_datalake_spark.workload.tables import pround

    cent_c = centroids.select("cell_id", F.col(vec).alias("_cv"))
    cent_q = centroids.select("cell_id", F.col(vec).alias("_qv"))
    inv = ivf_assign_cells(
        corpus.select(F.col(corpus_id), F.col(vec).alias("_cv")),
        cent_c,
        id_col=corpus_id,
        vec="_cv",
        nprobe=1,
        order_round=order_round,
    ).select(corpus_id, "_cv", "cell_id")
    probes = ivf_assign_cells(
        queries.select(F.col(query_id), F.col(vec).alias("_qv")),
        cent_q,
        id_col=query_id,
        vec="_qv",
        nprobe=nprobe,
        order_round=order_round,
    ).select(query_id, "_qv", "cell_id")
    w = Window.partitionBy(query_id).orderBy(
        pround(F.col("cosine_raw"), order_round).desc(), F.col(corpus_id)
    )
    return (
        inv.join(F.broadcast(probes), ["cell_id"])
        .withColumn("cosine_raw", cosine(F.col("_qv"), F.col("_cv")))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cell_id", "cosine_raw", "rank")
    )


def lsh_bucket_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN scale path: equi-join query/corpus on the hyperplane
    signature bucket, then score only within-bucket candidates.
    Reduces comparisons from |Q|·|C| to collisions; recall is tuned
    by the number of planes (fewer planes → bigger buckets)."""
    qs = queries.select(
        F.col(query_id), F.col(vec).alias("_qv"),
        hyperplane_signature(F.col(vec), planes).alias("bucket"),
    )
    cs = corpus.select(
        F.col(corpus_id), F.col(vec).alias("_cv"),
        hyperplane_signature(F.col(vec), planes).alias("bucket"),
    )
    return (
        cs.join(F.broadcast(qs), ["bucket"])
        .withColumn("cosine_raw", cosine(F.col("_qv"), F.col("_cv")))
        .select(query_id, corpus_id, "bucket", "cosine_raw")
    )


def pq_topk(
    emb: DataFrame,
    query_id_value,
    *,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    n_subspaces: int = 8,
    k: int = 10,
) -> DataFrame:
    """Product-quantization ANN: compress each vector into
    ``n_subspaces`` small codes, then rank the corpus against a query
    by asymmetric distance (ADC) — query-to-cell-centroid distances
    summed over subspaces — without ever touching full vectors at
    query time. Completes the ANN trio (LSH buckets, IVF cells, PQ
    codes): LSH and IVF prune WHICH vectors are scored; PQ shrinks
    WHAT is stored and scored (8 bytes/vector here vs 256 for raw
    float32×64), which is what makes billion-vector indexes fit in
    memory at all.

    The codebook is deterministic so a SQL oracle can re-derive it:
    each dimension contributes one sign bit against its global mean
    (8 dims → 8-bit code per subspace), and each populated
    (subspace, code) cell's centroid is the mean of its member
    subvectors — i.e. a 1-bit scalar quantizer per dim with empirical
    cell centers, the same estimate a PQ k-means would converge to
    under that partition. Production swaps in sampled k-means
    codebooks; every downstream step (code assignment, LUT build,
    ADC scoring) is unchanged.

    Scale shape: code assignment and centroid training shuffle slim
    (id, subspace, code/value) rows once each — at 100 TB the
    training step runs on a sample, assignment stays a full-scan
    map; the per-query lookup table is ≤ n_subspaces·256 rows
    (broadcast), and scoring is one equi-join on (subspace, code)
    plus a map-side-combined SUM per vector — no pairwise blowup
    anywhere. All sums ride the decimal-sum convention so distances
    are partition-order-exact.
    """
    from skysafe_datalake_spark.workload.relational import dsum

    sub_dim = dim // n_subspaces
    dims = emb.select(
        F.col(id_col),
        F.posexplode(vec).alias("d", "valf"),
    ).select(
        id_col,
        F.col("d").cast("bigint").alias("d"),
        F.col("valf").cast("double").alias("val"),
    )
    mu = dims.groupBy("d").agg(
        (dsum(F.col("val"), 8) / F.count("*")).alias("mu")
    )
    dm = dims.join(F.broadcast(mu), "d")
    bits = dm.groupBy(
        F.col(id_col),
        F.expr(f"CAST(d DIV {sub_dim} AS BIGINT)").alias("s"),
    ).agg(
        F.sum(
            F.when(
                F.col("val") >= F.col("mu"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(d % {sub_dim} AS INT))"
                ),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("code")
    )
    sub = dims.select(
        id_col,
        F.expr(f"CAST(d DIV {sub_dim} AS BIGINT)").alias("s"),
        F.expr(f"CAST(d % {sub_dim} AS BIGINT)").alias("j"),
        "val",
    )
    cent = (
        sub.join(bits, [id_col, "s"])
        .groupBy("s", "code", "j")
        .agg((dsum(F.col("val"), 8) / F.count("*")).alias("c"))
    )
    q = sub.where(F.col(id_col) == query_id_value).select(
        "s", "j", F.col("val").alias("qv")
    )
    lut = (
        cent.join(F.broadcast(q), ["s", "j"])
        .groupBy("s", "code")
        .agg(
            dsum(
                (F.col("qv") - F.col("c")) * (F.col("qv") - F.col("c")), 10
            ).alias("dist_sq")
        )
    )
    scored = (
        bits.where(F.col(id_col) != query_id_value)
        .join(F.broadcast(lut), ["s", "code"])
        .groupBy(id_col)
        .agg(dsum(F.col("dist_sq"), 10).alias("adist"))
    )
    return scored.orderBy("adist", id_col).limit(k)
