"""Deterministic job/stage/task counts per registry entry.

Wall-clock on this host is bimodal (BASELINE.md), so structural A/B
evidence for driver-action / shuffle-pass removals uses Spark's
StatusTracker instead: run each named entry once (after a shared
warm-up) and report how many jobs it submitted and how many stages /
tasks actually COMPLETED (skipped stages — cached lineage — are
excluded, so the task count is executed work, not plan size).

Usage:
    python tools/jobcount_entry.py <entry> [<entry> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_data_explorer_cdc_spark.kql import kql_unpersist_caches
from kafka_data_explorer_cdc_spark.queries import REGISTRY
from kafka_data_explorer_cdc_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1:] if n in REGISTRY]
    for n in sys.argv[1:]:
        if n not in REGISTRY:
            print(f"!! unknown entry {n}", file=sys.stderr)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kdec-jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def max_job_id() -> int:
        ids = st.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    def measure(lo: int, hi: int) -> tuple[int, int, int]:
        nstages = ntasks = 0
        for jid in range(lo + 1, hi + 1):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    nstages += 1
                    ntasks += si.numCompletedTasks
        return hi - lo, nstages, ntasks

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(REGISTRY[names[0]].fn(spark, sf_dir))
    spark.catalog.clearCache()
    kql_unpersist_caches()

    for name in names:
        lo = max_job_id()
        t0 = time.perf_counter()
        force(REGISTRY[name].fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        kql_unpersist_caches()
        time.sleep(0.3)  # let the listener drain before reading
        j, s, t = measure(lo, max_job_id())
        print(
            f"{name:44s} jobs={j:4d} stages={s:4d} tasks={t:6d} "
            f"wall={wall:6.2f}"
        )


if __name__ == "__main__":
    main()
