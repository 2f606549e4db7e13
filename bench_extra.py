"""Round-6 optimization measurement harness (bench.py is FROZEN for
driver measurement; everything exploratory lives here).

Times any subset of the declared contract queries with the SAME
session configuration and methodology as bench.py's query loop
(``.count()`` per query, release_caches between queries), at any SF
dir, with optional:

- ``--noop``: time ``df.write.format("noop")`` instead of ``.count()``
  (guide §1.4 — computes every column, isolates computation from the
  count-only column pruning)
- ``--explain plans/r06 --tag before``: write ``.explain("formatted")``
  for each selected query to ``<dir>/<query>_<tag>.txt``
- ``--repeats N``: per-query repeat count (reports all walls + min)

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --queries dedup_simhash,dedup_winnow --repeats 2
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(cpus: int = CPUS):
    """Session identical to bench.py run_once (so walls are comparable
    to the driver's loop)."""
    from aisafetyintervention_literatureextraction_spark.session import get_spark

    extra = {
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    return get_spark(f"bench-extra-{cpus}", cpus=cpus, shuffle_partitions=64,
                     extra_conf=extra)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=str, default="",
                    help="comma list; empty = all oracle-checked queries")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--noop", action="store_true",
                    help="noop-sink the full result instead of .count()")
    ap.add_argument("--explain", type=str, default="",
                    help="directory to write explain('formatted') files to")
    ap.add_argument("--tag", type=str, default="plan",
                    help="suffix for explain files: <query>_<tag>.txt")
    ap.add_argument("--sf-dir", type=str, default=SF_DIR)
    args = ap.parse_args()

    import __spark_entry__ as em
    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        release_caches,
    )

    def _host():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return v[7], sum(v)

    h0 = _host()
    qs = em.queries()
    names = [n for n in args.queries.split(",") if n] or sorted(em.oracle_sql())
    spark = build_session()
    out = {}
    try:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            for name in names:
                df = qs[name](spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"),
                          "w") as f:
                    f.write(plan)
                release_caches()
        for name in names:
            walls = []
            n = None
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                df = qs[name](spark, args.sf_dir)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    n = df.count()
                walls.append(round(time.time() - t0, 3))
                release_caches()
                spark.sparkContext.setJobDescription(None)
            if not walls:
                continue
            out[name] = {"walls_s": walls, "min_s": min(walls), "rows": n}
            print(json.dumps({name: out[name]}), flush=True)
    finally:
        spark.stop()
    h1 = _host()
    steal = round(100.0 * (h1[0] - h0[0]) / max(h1[1] - h0[1], 1), 3)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": CPUS, "noop": args.noop,
                      "steal_pct": steal, "results": out}))


if __name__ == "__main__":
    main()
