"""Same-box scaling CEILING calibration under any master: a trivially
parallel sha2-over-N-rows job — zero shuffle, zero write, one count-agg.
No real job can scale better than this on this box; efficiency numbers
are judged AGAINST this ceiling, not against 1.0.

Prints one JSON line. Master comes from SPARK_GRAFT_MASTER (same knob
as the scaling job), rows from CALIB_ROWS (default 80M). Warm run:
the measured window excludes a half-size warmup pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyrdf2vec_spark.session import get_spark


def main():
    rows = int(os.environ.get("CALIB_ROWS", str(80_000_000)))
    spark = get_spark("calib")

    def job(n):
        return (
            spark.range(n)
            .select(
                F.sha2(F.col("id").cast("string"), 256).alias("h")
            )
            .where(F.substring("h", 1, 1) != "zz")
            .count()
        )

    job(rows // 2)  # JIT/codegen warmup
    t0 = time.perf_counter()
    n = job(rows)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "calib": "sha2",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "master": os.environ.get("SPARK_GRAFT_MASTER", "local"),
                "rows": n,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
