"""Crawl-curation operators (workload/crawl.py, workload/sketches.py
kmv_set_ops): degenerate inputs and semantic invariants the oracle
parity test can't see (it only runs on the well-formed sf tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def weird_docs_dir(spark, tmp_path_factory):
    """A documents table with the shapes the crawler actually emits:
    empty text, one word, one char, and a multi-space-free normal doc."""
    path = str(tmp_path_factory.mktemp("crawl") / "docs")
    spark.createDataFrame(
        [
            (0, "", "en", "src0", 0),
            (1, "x", "en", "src1", 1),
            (2, "a b c d e f g h i j k l m n", "en", "src15", 27),
            (3, "spark join filter group sort merge window", "de", "src3", 41),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(path + "/documents.parquet")
    return path


def test_link_graph_empty_and_short_docs(spark, weird_docs_dir):
    """Docs with < 7 words contribute no anchors; longer docs link the
    host derived from every 7th word."""
    from skysafe_datalake_spark.workload.crawl import link_graph_extract

    rows = {
        r["host"]: (r["n_links"], r["n_docs"])
        for r in link_graph_extract(spark, weird_docs_dir).collect()
    }
    # doc 2: words at positions 7 and 14 -> hosts g., n.; doc 3 has
    # exactly 7 words -> host from 'window'.
    assert rows == {
        "g.example.com": (1, 1),
        "n.example.com": (1, 1),
        "window.example.com": (1, 1),
    }


def test_url_canonicalize_folds_all_variants(spark, weird_docs_dir):
    """Canonical URLs keep path case, lose scheme/host case, www.,
    :443, utm params, and the fragment; doc_ids with equal (source,
    doc_id%7, doc_id%13) synthesize to the same canonical key."""
    from skysafe_datalake_spark.workload.crawl import url_canonicalize

    rows = url_canonicalize(spark, weird_docs_dir).collect()
    urls = sorted(r["canonical_url"] for r in rows)
    assert urls == [
        "https://src0.example.com/Docs/0?id=0",
        "https://src1.example.com/Docs/1?id=1",
        "https://src15.example.com/Docs/2?id=2",
        "https://src3.example.com/Docs/3?id=3",
    ]
    assert all(r["n_docs"] == 1 for r in rows)


def test_quality_classifier_degenerate_words(spark, weird_docs_dir):
    """Empty text and 1-char words must not crash the char-hash
    (ascii('') is 0 in Spark) and the integer-score decision must
    agree with the sign rule iscore > 1."""
    from skysafe_datalake_spark.workload.crawl import quality_classifier_linear

    rows = {
        r["doc_id"]: r for r in quality_classifier_linear(
            spark, weird_docs_dir
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert 0.0 <= r["quality_prob"] <= 1.0
        assert r["is_high_quality"] == (r["iscore"] > 1)


@pytest.fixture(scope="module")
def overlap_docs_dir(spark, tmp_path_factory):
    """Two tiny corpora (A = 4-char sources, B = longer sources) that
    SHARE bigrams, so the KMV exactness assertions below exercise a
    nonzero intersection — a zero-overlap fixture made them vacuous
    (0 == 0) and masked a Jaccard-denominator bug (fixed r4)."""
    path = str(tmp_path_factory.mktemp("crawl_overlap") / "docs")
    spark.createDataFrame(
        [
            (0, "a b c d e f g h i j k l m n", "src15", "en", 27),
            (1, "spark join filter group sort merge window", "src3", "en", 41),
            (2, "spark join filter group sort", "src15", "en", 28),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    ).select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).parquet(path + "/documents.parquet")
    return path


def test_kmv_set_ops_small_corpus_is_exact(spark, overlap_docs_dir):
    """With fewer distinct bigrams than k on both sides, every sketch
    is the complete set: the estimates must EQUAL the exact answers
    (the KMV non-full-sketch rule) — including the intersection, which
    here is the 4 bigrams docs 1 (corpus A) and 2 (corpus B) share."""
    from skysafe_datalake_spark.workload.sketches import kmv_set_ops

    row = kmv_set_ops(spark, overlap_docs_dir).collect()[0]
    assert row["est_union"] == row["exact_union"]
    assert row["est_intersection"] == row["exact_intersection"]
    # 'spark join', 'join filter', 'filter group', 'group sort'
    assert row["exact_intersection"] == 4


def test_kmv_set_ops_disjoint_corpora(spark, weird_docs_dir):
    """Zero-overlap corpora: estimates still equal exact answers and
    the intersection estimate is exactly 0 (k_both = 0)."""
    from skysafe_datalake_spark.workload.sketches import kmv_set_ops

    row = kmv_set_ops(spark, weird_docs_dir).collect()[0]
    assert row["est_union"] == row["exact_union"]
    assert row["est_intersection"] == row["exact_intersection"]
    # corpus A (src0-9: docs 0,1,3) and B (src15: doc 2) share no bigrams
    assert row["exact_intersection"] == 0
