"""Local replica of the driver's t2 correctness gate.

For every registry query with an oracle: run the Spark query and the
DuckDB SQL at sf0.001, compare row count, column names, and an
order-insensitive value snapshot. Catching a mismatch here is ~100x
cheaper than waiting for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL

from skysafe_datalake_spark.workload import ORACLE, QUERIES


def _normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we demand bit-identical doubles
    if isinstance(v, (int, str)):
        return str(v)
    return str(v)


def _snapshot(columns, rows):
    """Column-name-sorted, row-order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    body = sorted("|".join(_normalize(r[i]) for i in order) for r in rows)
    return cols, body


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(ORACLE[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    s_cols, s_body = _snapshot(spark_cols, spark_rows)
    d_cols, d_body = _snapshot(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column sets differ"
    assert len(s_body) == len(d_body), (
        f"{name}: row count {len(s_body)} != oracle {len(d_body)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_body, d_body) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_all_queries_run(spark):
    """Queries without an oracle must still execute and be stable."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name
