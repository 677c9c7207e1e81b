"""Profile one registered query: run it (noop sink) and print per-stage
wall/metrics from the local Spark UI REST API — the headless stand-in
for the Stages tab (guide §1.1/§7.1).

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from icnarc_to_philips_linkage_spark.plans.registry import all_queries
    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = all_queries()[name]
    # warm
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(
        1000
    ).groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    # cold-ish pass then measured pass
    for tag in ("pass1", "pass2"):
        spark.sparkContext.setJobDescription(f"{name}:{tag}")
        t = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{tag}: {time.time() - t:.2f}s", flush=True)
        spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(
        f"{'stage':>5} {'wall_ms':>8} {'runTime':>8} {'cpu_ms':>8} "
        f"{'tasks':>5} {'in_MB':>7} {'sh_rMB':>7} {'sh_wMB':>7}  name"
    )
    for s in stages[:25]:
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        wall = ""
        try:
            from datetime import datetime

            f = "%Y-%m-%dT%H:%M:%S.%f%Z"
            wall = round(
                (
                    datetime.strptime(comp, f) - datetime.strptime(sub, f)
                ).total_seconds()
                * 1000
            )
        except Exception:
            pass
        print(
            f"{s['stageId']:>5} {wall:>8} {s.get('executorRunTime', 0):>8}"
            f" {round((s.get('executorCpuTime') or 0) / 1e6):>8}"
            f" {s.get('numCompleteTasks', 0):>5}"
            f" {round((s.get('inputBytes') or 0) / 1e6, 1):>7}"
            f" {round((s.get('shuffleReadBytes') or 0) / 1e6, 1):>7}"
            f" {round((s.get('shuffleWriteBytes') or 0) / 1e6, 1):>7}"
            f"  {s.get('description') or s.get('name', '')[:70]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
