"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl+extract pipeline over a page corpus
derived from ``/root/testdata/sf0.001``; ``queries()`` / ``oracle_sql()``
expose the full operator registry (anycrawl_spark.operators.queries) for the
sf0.01 DuckDB correctness gate. See SURVEY.md §2 for the operator inventory
each entry maps to.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive a Common-Crawl-style page corpus from the sf0.001
    documents table, crawl it (BFS rounds, seen-filter, extraction UDF), and
    return the extracted page results."""
    from anycrawl_spark.corpus import pages_from_documents
    from anycrawl_spark.crawl import CrawlConfig, CrawlEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    ckpt = tempfile.mkdtemp(prefix="anycrawl_entry_")
    engine = CrawlEngine(spark, pages, ckpt)
    engine.run(CrawlConfig(
        job_id="entry", seed_url="https://docs.test/d/0",
        strategy="same-hostname", max_depth=5, limit=30,
        respect_robots=False))
    return engine.results().select(
        "seq", "url", "depth", "status", "title",
        F.length("markdown").cast("long").alias("markdown_len"),
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("seq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered_registry puts one query per operator family in the first 50
    # entries (the driver's correctness-gate window); redundant sf-small
    # twins are demoted past the cutoff but stay registered and locally
    # validated (tools/validate_oracle.py + pytest).
    from anycrawl_spark.operators.queries import ordered_registry

    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    from anycrawl_spark.operators.queries import ordered_registry

    return {name: spec.oracle for name, spec in ordered_registry().items()
            if spec.oracle is not None}
