"""Build the --py-files artifact for cluster submission.

The north rule runs the job "via spark-submit --py-files on multi-executor
clusters"; this packages the engine the standard way:

    python tools/package.py              # -> dist/excelastic_spark.zip
    spark-submit --py-files dist/excelastic_spark.zip index.py \
        --warehouse s3://bucket/wh --name code_idx \
        build --corpus s3://bucket/corpus

The zip is deterministic (sorted entries, fixed timestamps) so repeated
packaging of the same tree is byte-identical — convenient for content-hash
caching of the artifact next to the index fingerprint.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "excelastic_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "excelastic_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            zi = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(zi, fh.read())
    return out_path


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
