"""Per-entry profiling harness for the optimization rounds.

For each named registry entry: time the builder call (driver-side work —
collects, streaming drains, codebook loops all happen here) separately
from the noop force of the returned DataFrame (the declared query's
executor work), and optionally dump ``explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python tools/profile_entry.py d61_kmeans_quantizer_train d50_... \
        [--reps 3] [--plans plans/r13 --suffix before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_data_explorer_cdc_spark.kql import kql_unpersist_caches
from kafka_data_explorer_cdc_spark.queries import REGISTRY
from kafka_data_explorer_cdc_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kdec-profile")
    spark.sparkContext.setLogLevel("ERROR")

    names = []
    for n in args.names:
        if n not in REGISTRY:
            print(f"!! unknown entry {n}", file=sys.stderr)
            continue
        names.append(n)

    # warm the JVM once (same as bench.py)
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    kql_unpersist_caches()

    print(f"{'entry':44s} {'build_s':>8s} {'force_s':>8s} {'total_s':>8s}")
    for name in names:
        builds, forces = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            forces.append(t2 - t1)
            spark.catalog.clearCache()
            kql_unpersist_caches()
        b = statistics.median(builds)
        f = statistics.median(forces)
        print(f"{name:44s} {b:8.2f} {f:8.2f} {b + f:8.2f}", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = REGISTRY[name].fn(spark, sf_dir)
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(
                    spark._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                )
            spark.catalog.clearCache()
            kql_unpersist_caches()


if __name__ == "__main__":
    main()
