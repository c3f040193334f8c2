import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from qurious_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="session")
def session(spark):
    from qurious_spark import Session

    s = Session(spark)
    from qurious_spark.sources import load_tables

    load_tables(spark, SF_SMOKE)
    return s


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()
