import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # a 1300-test suite in one JVM emits codegen classes far past the
        # JDK 17 default 240m code-cache reserve; same measured fix as
        # bench.py (r9: 0.907x on the 70-query bench A/B)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(s)
    yield s


@pytest.fixture(scope="session")
def ctx(spark):
    from datafusion_ballista_python_spark import BallistaContext

    return BallistaContext(spark=spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
