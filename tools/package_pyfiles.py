"""Build dist/geotreehealth_spark.zip for spark-submit --py-files.

The north_rule deliverable runs on a multi-executor cluster as
    spark-submit --py-files dist/geotreehealth_spark.zip tools/submit_job.py ...
so executors import the engine from the shipped zip. This packager zips the
package sources only (no tests, no caches), deterministically ordered.
"""
from __future__ import annotations

import os
import sys
import zipfile


def build(repo_root: str, out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(repo_root, "dist", "geotreehealth_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(repo_root, "geotreehealth_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, repo_root), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            z.write(full, arcname)
    return out_path


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    print(build(root))
