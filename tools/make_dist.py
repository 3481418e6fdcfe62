"""Package cliner_spark for spark-submit --py-files (north rule deployment
mode). Produces dist/cliner_spark.zip containing the package sources.

Usage:
  python tools/make_dist.py
  spark-submit --master local[32] --py-files dist/cliner_spark.zip \
      cliner_spark/pipeline.py --input <parquet> --output /tmp/triples
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "cliner_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "cliner_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, REPO)
                    z.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(make_zip())
