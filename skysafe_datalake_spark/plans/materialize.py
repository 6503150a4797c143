"""Materialize-once for bounded intermediates that feed several plan
branches.

Spark's exchange reuse does NOT collapse duplicated *unexchanged*
subtrees: a frame consumed by N branches re-runs its full upstream
scan N times unless lineage is cut or the frame is cached. Two tools
exist, with different tradeoffs measured on this build (Spark 4.1.2,
AQE on):

- ``df.localCheckpoint(eager=False)``: despite ``eager=False``, AQE
  materializes every upstream shuffle stage AT THE CALL — i.e. at
  query-BUILD time (verified: jobs launch inside the builder before
  any action; plan-only consumers such as ``df.explain`` and the
  ``tools/plan_audit.py`` sweep execute the whole subtree just to
  print a plan — at 100 TB an explain becomes a multi-TB job). The
  checkpoint also stores blocks executor-locally WITHOUT lineage: if
  an executor holding blocks is lost (dynamic allocation, spot
  instances, decommission), every consumer fails irrecoverably
  instead of recomputing. Its one advantage: blocks are freed by
  driver GC of the RDD, no unpersist bookkeeping.

- ``df.persist(MEMORY_AND_DISK)``: fully lazy (0 jobs at builder or
  explain time, verified), computes the subtree once on first action,
  every consumer reads ``InMemoryTableScan``, and lineage is KEPT so
  a lost cache partition recomputes instead of failing. Cost: the
  cache entry lives until ``unpersist()`` or session end — acceptable
  only when the cached frame is BOUNDED (k rows, a contingency table,
  a 1-row aggregate), never for corpus-sized frames.

This helper encodes that decision: bounded multi-consumer
intermediates persist; corpus-sized or iterative lineage cuts (graph
fixed-points, dedup signature tables) keep using ``localCheckpoint``
at their call sites, where block GC outweighs the builder-time job
and the docstrings carry the AQE caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize_bounded(df: DataFrame) -> DataFrame:
    """Cache a BOUNDED multi-consumer intermediate, lazily.

    The caller asserts the frame is small (≤ thousands of rows) at any
    scale factor — the cache entry is never explicitly unpersisted, so
    an unbounded frame here would pin corpus-sized storage for the
    session lifetime.

    The unpersist-first is load-bearing for measurement honesty: the
    CacheManager matches CANONICALIZED plans session-wide, so a second
    build of the same query (a later bench pass, a repeated service
    call) would silently reuse the first build's materialized blocks —
    its timed action then skips the build subtree entirely, which is
    cross-run result caching, not a property of the plan (observed
    live: graph_triangles' bench pass 1 at 6.7 s, passes 2-3 at 0.6 s
    reading pass 1's backbone). ``unpersist`` resolves by the same
    canonical-plan match, so calling it on the FRESH frame evicts any
    stale entry from a previous build; within one build, every
    consumer still shares the single lazy materialization.
    """
    df.unpersist()
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def persist_hot(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Lazy, partitioning-preserving cut for an ITERATIVE query's hot
    table (graph edges/nodes), with the same stale-entry eviction as
    :func:`materialize_bounded`.

    Why not ``localCheckpoint`` (the previous pattern here): under AQE
    the checkpoint materializes at BUILD time (each one a synchronous
    barrier — three of them serialized a fixed-point loop), and the
    checkpointed RDD hides the frame's hash partitioning behind an
    ``ExistingRDD``, so every loop iteration re-exchanged a table that
    was already partitioned on the join key. A persisted
    ``InMemoryRelation`` keeps ``outputPartitioning`` visible (AQE does
    not re-partition cached plans —
    ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
    false by default), so a loop joining on the partitioning key runs
    exchange-free, and DataFrame cache blocks are compressed columnar
    batches, not the deserialized row objects that OOMed the 64x
    smoke's RDD checkpoints (pass ``DISK_ONLY`` above the big-graph
    threshold anyway — zero storage heap, lineage kept for recovery).

    Unlike :func:`materialize_bounded` the cached frame may be
    corpus-sized; the unpersist-first bounds session retention to ONE
    build's working set per query (a rebuild evicts the previous
    entries), which replaces the ContextCleaner-driven GC the RDD
    checkpoints relied on.
    """
    df.unpersist()
    return df.persist(level)
