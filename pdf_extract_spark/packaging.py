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

_ZIP_CACHE: dict[tuple[str, str], str] = {}


def _source_digest(entries: list[tuple[str, str]]) -> str:
    """Content digest of the package source. The zip cache keys on THIS,
    not just the package dir: a long-lived driver whose source was
    edited mid-session must rebuild (a dir-keyed cache re-shipped the
    stale pre-edit bytes, which addPyFile silently accepts as equal —
    exactly the silent version skew _ensure_shipped promises to
    surface)."""
    import hashlib

    h = hashlib.md5()
    for rel, full in sorted(entries):
        h.update(rel.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _package_entries(pkg_dir: str) -> list[tuple[str, str]]:
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.join("pdf_extract_spark", os.path.relpath(full, pkg_dir))
            entries.append((rel, full))
    return entries


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Zip the pdf_extract_spark package; returns the zip path. The
    cache keys on (source content, requested dest_dir) — an explicit
    dest_dir is always honored, and edited source always rebuilds."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = _package_entries(pkg_dir)
    key = (_source_digest(entries), dest_dir or "")
    if key in _ZIP_CACHE and os.path.exists(_ZIP_CACHE[key]):
        return _ZIP_CACHE[key]
    if dest_dir is None:
        dest_dir = tempfile.mkdtemp(prefix="pdf_extract_spark_pyfiles_")
    else:
        os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "pdf_extract_spark.zip")
    # Byte-DETERMINISTIC archive: sorted entry order, zeroed timestamps.
    # Spark's addPyFile dedups by file NAME and silently skips a re-add
    # whose bytes match the already-registered copy, but raises "exists
    # and does not match contents" when they differ. With live mtimes a
    # rebuild of IDENTICAL source produced different bytes, making that
    # error ambiguous (benign rebuild vs real version skew); with a
    # deterministic zip it fires only when the package source genuinely
    # changed under a live context — which must surface, not be caught.
    with zipfile.ZipFile(zip_path, "w") as zf:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    _ZIP_CACHE[key] = zip_path
    return zip_path


def ship_package(spark) -> str:
    """Make the package importable on executors via addPyFile."""
    zip_path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
