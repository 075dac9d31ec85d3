import pytest
from pyspark.sql import SparkSession

from webcrawler_spark.session import apply_perf_conf


@pytest.fixture(scope="session")
def spark():
    s = (
        apply_perf_conf(
            SparkSession.builder.master("local[8]")
            .appName("webcrawler-spark-tests")
            .config("spark.driver.memory", "4g")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
        )
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
