"""Package pdf_table_spark into dist/pdf_table_spark.zip for
``spark-submit --py-files`` (the north-rule deployment unit)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "pdf_table_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "pdf_table_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(make_zip())
