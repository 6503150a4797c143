"""Local replica of the driver's t2 correctness gate.

For every registry query with an oracle: run the Spark query and the
DuckDB SQL at sf0.001, compare row count, column names, and an
order-insensitive value snapshot. Catching a mismatch here is ~100x
cheaper than waiting for CORRECTNESS_r{N}.json.

Both sides are canonicalized through PANDAS (Spark .toPandas(), DuckDB
.df()) because that is what the driver gate does. This is load-bearing:
DuckDB promotes integer SUM() to HUGEINT, which pandas renders as
float64 (123 -> 123.0) while Spark returns int64 -- three round-2 gate
rows went red on exactly that even though fetchall() values matched.
A fetchall()-based compare cannot see the artifact; this one can.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL

from skysafe_datalake_spark.workload import ORACLE, QUERIES


def _normalize(v):
    """Canonical string for one cell, preserving dtype distinctions the
    driver's hash preserves: int64 123 and float64 123.0 must differ."""
    # Sequence-likes first: pd.isna() on them returns an array.
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_normalize(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_normalize(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_normalize(x)}" for k, x in sorted(v.items())) + "}"
    if v is None or v is pd.NaT or v is pd.NA:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # Distinct from "NULL": inside float64 columns pandas
            # renders SQL NULL as NaN on BOTH sides (so the token
            # choice can't break matching there), but in object-dtype
            # cells (arrays, structs, mixed columns) None and float
            # NaN are genuinely distinguishable — and a gate-predictor
            # should be stricter than the gate, never looser.
            return "NaN"
        return repr(f)  # full precision: we demand bit-identical doubles
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # DATE columns come back as datetime.date from Spark.toPandas()
        # but as midnight datetime64 from DuckDB.df() (pandas has no
        # date dtype). The driver gate tolerates that pair
        # (datetime_functions was driver-green in r2 with DATE output),
        # so collapse midnight timestamps to date form here too.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def _snapshot(pdf: pd.DataFrame):
    """Column-name-sorted, row-order-insensitive canonical form."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    body = sorted(
        "|".join(_normalize(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, body


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL)
    spark_pdf = sdf.toPandas()

    duck_pdf = duck.sql(ORACLE[name]).df()

    s_cols, s_body = _snapshot(spark_pdf)
    d_cols, d_body = _snapshot(duck_pdf)

    assert s_cols == d_cols, f"{name}: column sets differ: {s_cols} vs {d_cols}"
    assert len(s_body) == len(d_body), (
        f"{name}: row count {len(s_body)} != oracle {len(d_body)}"
    )
    mismatches = [(a, b) for a, b in zip(s_body, d_body) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_all_queries_run(spark):
    """Queries without an oracle must still execute and be stable."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name
