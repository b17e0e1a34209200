import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def packed_models():
    from lingua_spark.resources import packed_models as pm

    return pm()


@pytest.fixture(scope="session")
def oracle_tables():
    from lingua_spark.resources import oracle_tables as ot

    return ot()


@pytest.fixture(scope="session")
def ft_model():
    from lingua_spark.resources import fasttextish

    return fasttextish()


@pytest.fixture(scope="session")
def spark():
    from lingua_spark.engine.pipeline import build_session

    spark = build_session(app="lingua-spark-tests", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
