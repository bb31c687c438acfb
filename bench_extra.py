"""Round-6 measurement harness (guide §1): per-query isolation with
repeats, contention probe, stage-level attribution via the status API,
and plan dumps. NEVER used by the driver — bench.py stays the frozen
measurement; this file only produces the evidence cited in
OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py --query conversation --reps 3
    python bench_extra.py --query conversation --plan plans/r06/conversation_before.txt
    python bench_extra.py --query all --reps 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import bench  # the frozen harness supplies session + query bodies


def build_session(ui: bool = False):
    """bench.build_session configs, optionally with the UI/status API on
    (status API is how stage-level attribution is read)."""
    import os

    if ui:
        os.environ["_BENCH_EXTRA_UI"] = "1"
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{bench.CPUS}]")
            .appName("bench-extra")
            .config("spark.sql.shuffle.partitions", str(max(8, bench.CPUS)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .config("spark.sql.files.maxPartitionBytes", "4m")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4099")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        return spark
    return bench.build_session(bench.CPUS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dump explain(formatted) to this path")
    ap.add_argument("--ui", action="store_true")
    args = ap.parse_args()

    probe0 = bench._contention_probe()
    spark = build_session(ui=args.ui)
    transcripts = bench.bench_transcripts(spark, bench.BENCH_CONVS)
    transcripts.count()

    qs = bench.headline_queries(spark, transcripts)
    names = list(qs) if args.query == "all" else [args.query]

    out = {"probe_before": probe0, "timings": {}}
    for name in names:
        fn = qs[name]
        times = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 3))
        out["timings"][name] = times
    out["probe_after"] = bench._contention_probe()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
