from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    if shutil.which("java") is None:
        pytest.skip("no JVM available", allow_module_level=True)
    from skysafe_datalake_spark.session import get_spark

    s = get_spark(
        app_name="skysafe-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


def make_duck(sf_dir: str):
    """DuckDB connection with the driver's pre-registered views."""
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_SMALL)
    yield con
    con.close()
