"""Ship the package to executors (the ``spark-submit --py-files`` shape).

Python workers unpickle UDF closures by importing ``dr_source_spark`` — on a
real cluster that import is satisfied by ``--py-files dr_source_spark.zip``;
for interactive/driver-harness sessions we build the same zip once and
``addPyFile`` it, so the engine works regardless of the driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: "set[int]" = set()


def package_zip_path() -> str:
    """Build (idempotently) a zip of the dr_source_spark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "dr_source_spark_pyfiles.zip")
    sources = []
    for dirpath, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                fp = os.path.join(dirpath, fn)
                arc = os.path.join("dr_source_spark", os.path.relpath(fp, pkg_dir))
                sources.append((fp, arc))
    newest = max(os.path.getmtime(fp) for fp, _ in sources)
    if os.path.exists(out) and os.path.getmtime(out) >= newest:
        return out
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for fp, arc in sources:
            zf.write(fp, arc)
    os.replace(tmp, out)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """addPyFile the package zip once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    try:
        sc.addPyFile(package_zip_path())
    except Exception:
        # e.g. a context that already has the file or forbids late adds —
        # imports may still resolve via PYTHONPATH/--py-files.
        pass
    _SHIPPED_SESSIONS.add(key)
