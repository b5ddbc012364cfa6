#!/usr/bin/env python
"""Focused per-query timing: median-of-N noop-sink wall time for the
named queries (bench.py methodology: warm-up + interleaved reps),
printed as JSON with the machine-speed canaries. For before/after
evidence on a subset without paying a full bench pass.

    python scripts/time_queries.py q_a q_b ...   [reps via $REPS]
"""

from __future__ import annotations

import json
import os
import sys

from chill_spark import queries as Q
from chill_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    cpu_calibration,
    cpu_calibration_parallel,
    force,
    interleaved_medians,
)


def main() -> int:
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calib = cpu_calibration()
    calib_par = cpu_calibration_parallel()
    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    force(registry["q1_pricing_summary"](spark, sf_dir).limit(1))
    # Arrow worker warm-up (same as bench.py)
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda x: x, "double")
    force(spark.range(0, 32 * 1024, 1, 32).select(
        warm(F.col("id").cast("double"))))
    meds, spread, _loads = interleaved_medians(
        names, lambda name: force(registry[name](spark, sf_dir)), reps
    )
    print(json.dumps({
        "medians": meds, "spread": spread, "reps": reps,
        "total": round(sum(meds.values()), 3),
        "calib_s": calib, "calib_par_s": calib_par,
        "load": [round(x, 2) for x in os.getloadavg()],
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
