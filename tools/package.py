"""Package the engine for spark-submit --py-files: zips jsonld_rs_spark/
into dist/jsonld_rs_spark.zip (importable from the zip root)."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "jsonld_rs_spark.zip")
    pkg = os.path.join(REPO, "jsonld_rs_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".pyc"):
                    continue
                path = os.path.join(root, name)
                zf.write(path, os.path.relpath(path, REPO))
    print(out)


if __name__ == "__main__":
    main()
