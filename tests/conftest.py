import datetime as dt

import pytest
from pyspark.sql import SparkSession

from logstash_filter_aggregate_spark.session import get_spark

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


def make_transcript(spark, rows, conv="c1"):
    """rows: (turn_idx, text, offset_s) or (conv_id, turn_idx, text, offset_s)."""
    data = []
    for r in rows:
        if len(r) == 3:
            c, (i, txt, off) = conv, r
        else:
            c, i, txt, off = r
        data.append((c, i, "user", txt, "none", T0 + dt.timedelta(seconds=off)))
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
