"""Build dist/pagerank_spark.zip for ``spark-submit --py-files``.

Usage:  python scripts/build_pyfiles.py
Then:   spark-submit --py-files dist/pagerank_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "pagerank_spark")
OUT = os.path.join(ROOT, "dist", "pagerank_spark.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(PKG):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
