"""Preload heavy modules in the pyspark worker daemon.

The pyspark daemon (`python -m pyspark.daemon`) forks one child per
task; children inherit the daemon's memory copy-on-write.  Importing
numpy/pyarrow/pandas and our codec package HERE (the daemon imports
`sitecustomize` at interpreter startup) means every forked worker gets
the ~100 MB of imported pages for free instead of first-touch-faulting
them concurrently — on virtualized hosts those concurrent fault storms
serialize and invert scaling (measured: a passthrough mapInArrow stage
took 4x longer at local[32] than at local[8] without this).

Activated only when SPARK_GRAFT_PRELOAD=1 (set by
parquet_spark.tune_malloc_for_workers) so plain `python` invocations on
this path are unaffected.
"""

import os

if os.environ.get("SPARK_GRAFT_PRELOAD") == "1":
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        import parquet_spark.codecs.column  # noqa: F401
        import parquet_spark.engine  # noqa: F401
    except Exception:  # never break interpreter startup
        pass
