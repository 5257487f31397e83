#!/usr/bin/env python
"""Package xsearch_spark for ``spark-submit --py-files`` (BASELINE.json:14).

Pure-Python package, no JARs to build — the whole engine ships as one
zip: ``python scripts/make_pyfiles_zip.py [out.zip]``.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "xsearch_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "xsearch_spark.zip")
    print(build_zip(out))
