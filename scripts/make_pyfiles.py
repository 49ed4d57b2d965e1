"""Build parquet_spark.zip for `spark-submit --py-files` shipping.

Usage:
    python scripts/make_pyfiles.py [out.zip]
    spark-submit --master <cluster> --py-files parquet_spark.zip \
        scripts/encode_job.py --input ... --mode splits

The zip contains the `parquet_spark` package plus `sitecustomize.py`
(worker-daemon preload; see its docstring). North-rule contract: "the
whole pipeline ships via spark-submit --py-files" (BASELINE.json:6).
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(REPO, "parquet_spark")):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "sitecustomize.py"), "sitecustomize.py")
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "parquet_spark.zip")
    print(build(out))
