"""Package whoosh_spark for spark-submit --py-files.

Usage:  python scripts/make_dist.py [out.zip]
Builds a source zip of the package (no build step needed — pure Python),
suitable for ``spark-submit --py-files dist/whoosh_spark.zip``.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_dist(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "whoosh_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "whoosh_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(make_dist(sys.argv[1] if len(sys.argv) > 1 else None))
