#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver bench — bench.py is frozen for measurement.  This file
exists so individual queries can be timed with the noop sink (guide §1.4:
eager full-column execution, no sink cost, no count()-induced column
pruning surprises), labelled in the UI, and their .explain("formatted")
captured to plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--plans OUTDIR] [--count]
                        [query ...]

With no query names, runs the full bench.py HEADLINE suite.  --count times
`df.count()` instead of the noop write, mirroring the frozen bench.py
methodology exactly (the per-query numbers the driver compares are
count()-based).  Prints one JSON line with per-query min / all trials.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--count", action="store_true",
                    help="time df.count() (bench.py methodology) instead of"
                         " the noop sink")
    args = ap.parse_args()

    from bench import HEADLINE, _suite_fns, _stop_drained
    from spacetime_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries or HEADLINE
    fns = _suite_fns()
    spark = get_spark(master=f"local[{cpus}]", app_name="bench-extra")
    # same warmup as bench.py so first-trial numbers are comparable
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    fns["a2_subdomain_histogram"](spark, args.sf).count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = fns[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"# plan -> {args.plans}/{name}.txt", file=sys.stderr)

    trials: dict[str, list[float]] = {n: [] for n in names}
    loads = [round(x, 2) for x in os.getloadavg()]
    for t in range(args.trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # fn() INSIDE the timed region, exactly like bench.py — several
            # queries do eager work (localCheckpoint) at build time
            t0 = time.monotonic()
            df = fns[name](spark, args.sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            trials[name].append(round(dt, 3))
            print(f"# [{t+1}] {name}: {dt:.2f}s", file=sys.stderr)
    _stop_drained(spark)
    out = {
        "sf": args.sf,
        "mode": "count" if args.count else "noop",
        "loadavg_start": loads,
        "queries_min": {n: min(ts) for n, ts in trials.items()},
        "trials": trials,
        "total_min": round(sum(min(ts) for ts in trials.values()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
