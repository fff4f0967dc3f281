#!/usr/bin/env python
"""Package the engine for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    out = os.path.join(ROOT, "learnedspatial_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("learnedspatial_spark", "oracle"):
            for dirpath, _, files in os.walk(os.path.join(ROOT, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
