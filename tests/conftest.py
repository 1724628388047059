from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peskas_mozambique_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # local[8] (when the host has the cores): every test was engineered
    # partition-count-invariant (the CPUS=3 / sf0.1 determinism matrices),
    # so extra cores only cut wall-time of the data-heavy parity tests.
    # shuffle_partitions stays 4 — tiny-data shuffles dominate the suite
    # and more reduce partitions would only add task overhead.
    cores = int(os.environ.get("SPARK_GRAFT_TEST_CORES", "0")) or min(
        8, os.cpu_count() or 4
    )
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_AQE", "1") == "0":
        extra["spark.sql.adaptive.enabled"] = "false"
    s = get_spark(
        app_name="tests",
        master=f"local[{cores}]",
        shuffle_partitions=4,
        extra_conf=extra,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive compare."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
