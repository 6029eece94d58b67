"""Packaging for spark-submit --py-files (north-rule requirement).

On a real cluster the job ships as::

    spark-submit --py-files pdf_extract_spark.zip job.py

For programmatic sessions (tests, bench, notebooks) ``build_spark`` calls
:func:`ship_package`, which builds the same zip once per process and
registers it via ``SparkContext.addPyFile`` so Python workers can import
the package regardless of their working directory.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_ZIP_CACHE: dict[str, str] = {}


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Zip the pdf_extract_spark package; returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    key = pkg_dir
    if key in _ZIP_CACHE and os.path.exists(_ZIP_CACHE[key]):
        return _ZIP_CACHE[key]
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="pdf_extract_spark_pyfiles_")
    zip_path = os.path.join(dest_dir, "pdf_extract_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "pdf_extract_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    _ZIP_CACHE[key] = zip_path
    return zip_path


def ship_package(spark) -> str:
    """Make the package importable on executors via addPyFile."""
    zip_path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
