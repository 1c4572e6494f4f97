#!/usr/bin/env python
"""Build co_deduplicate_spark.zip for spark-submit --py-files.

Usage:
  python package.py [--out co_deduplicate_spark.zip]

The zip contains the package sources only (no tests, no caches) and is
importable via zipimport — exactly what executors need:

  spark-submit --py-files co_deduplicate_spark.zip main.py --input ... --workdir ...
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path

PKG = Path(__file__).parent / "co_deduplicate_spark"


def build(out: str) -> int:
    files = sorted(
        p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            z.write(p, p.relative_to(PKG.parent))
    print(f"{out}: {len(files)} files")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="co_deduplicate_spark.zip")
    sys.exit(build(ap.parse_args().out))
