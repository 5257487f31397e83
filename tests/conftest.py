from __future__ import annotations

import pytest

from xsearch_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xsearch-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = _duck_con(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_med():
    con = _duck_con(SF_DIR_MED)
    yield con
    con.close()
