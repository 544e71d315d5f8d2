import os
import shutil
import tempfile

import pytest

os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("anycrawl-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="anycrawl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_corpus(spark, tmp_root):
    """Deterministic 120-page / 6-host fixture corpus, written once."""
    from anycrawl_spark.corpus import generate_pages

    path = os.path.join(tmp_root, "pages")
    generate_pages(spark, 120, num_hosts=6, partitions=4).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="session")
def robots_df(spark):
    from anycrawl_spark.corpus import generate_robots

    return generate_robots(spark, num_hosts=6)
