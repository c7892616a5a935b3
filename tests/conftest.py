"""Shared Spark session + cached fixture tables for the test suite."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


def _build_session(master: str = "local[4]", shuffle_partitions: int = 8):
    from pyspark.sql import SparkSession

    from engine import config

    return (SparkSession.builder
            .master(master)
            .appName("spark-clip-quality-tests")
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            # windowed aggs align to UTC epoch; pin the session zone so
            # NTZ<->TZ casts are identity and results are host-independent
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                    str(config.ARROW_MAX_RECORDS_PER_BATCH))
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


@pytest.fixture(scope="session")
def spark():
    s = _build_session()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def clips_t1(spark, tmp_path_factory):
    """t1 smoke fixture: 2000 clips written as partitioned parquet."""
    from engine import fixtures

    clips_pd, planted = fixtures.generate_clips(2000, seed=42, profile="test")
    path = str(tmp_path_factory.mktemp("clips_t1") / "clips")
    fixtures.write_clips_parquet(spark, clips_pd, path)
    return path, clips_pd, planted
