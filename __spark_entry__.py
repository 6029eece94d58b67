"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator suite from
SURVEY.md §2 plus the training-data operators (dedup / similarity /
text analysis), each with a value-exact DuckDB oracle where the
semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable on executors even when the driver
    process didn't create the session through build_spark.

    Nothing is swallowed. ``build_pyfiles_zip`` is byte-deterministic
    (sorted entries, zeroed timestamps), and Spark's addPyFile silently
    skips a re-add whose bytes equal the already-registered
    ``pdf_extract_spark.zip`` — so the only way ``ship_package`` can
    raise "exists and does not match contents" is genuine version skew:
    this driver's package source differs from what the live context
    already shipped to executors. Running on would mix new driver code
    with stale executor code, so that must fail HERE at entry, not
    later as silently-wrong results."""
    from pdf_extract_spark.packaging import ship_package

    try:
        ship_package(spark)
    except Exception as e:
        if "exists and does not match contents" in str(e):
            raise RuntimeError(
                "pdf_extract_spark version skew: this SparkContext already "
                "shipped a pdf_extract_spark.zip built from DIFFERENT package "
                "source (the pyfiles zip is byte-deterministic, so equal "
                "source never raises this). Restart the session so executors "
                "pick up the current code."
            ) from e
        if type(e).__name__ == "PySparkNotImplementedError":
            # Spark Connect sessions expose no SparkContext to addPyFile
            # through; the defensive zip shipping simply does not apply
            # there (such deployments ship artifacts at session creation,
            # e.g. spark.addArtifacts). Everything else still raises: on
            # a classic context a failed addPyFile IS actionable.
            return
        raise


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    from pdf_extract_spark.queries import QUERIES

    return QUERIES["extract_spans_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pdf_extract_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    from pdf_extract_spark.queries import ORACLES

    return dict(ORACLES)
