#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN — this file is the
builder's own instrument, guide §1).

Times individual declared queries with the same methodology as bench.py
(.count() on the returned frame, best-of-N), optionally isolates the
computation with the noop sink (guide §1.4), and captures
``explain("formatted")`` per query into plans/r06/.

Usage:
  python bench_extra.py [--queries a,b,c] [--repeats N] [--noop]
                        [--explain before|after] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of .count()")
    ap.add_argument("--explain", default="",
                    help="also write plans/r06/<q>_<tag>.txt explain output")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from co_deduplicate_spark.session import build_session

    import __spark_entry__ as em

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("co_dedup_bench_extra", cores=cpus, driver_memory="48g")
    qs = em.queries()
    names = [q for q in args.queries.split(",") if q] or list(qs)

    plans_dir = "plans/r06"
    os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for _ in range(args.repeats):
        em._VERIFIED_CACHE.clear()
        for name in names:
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            samples.setdefault(name, []).append(round(dt, 3))
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)
            spark.sparkContext.setJobDescription(None)
    if args.explain:
        em._VERIFIED_CACHE.clear()
        for name in names:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{plans_dir}/{name}_{args.explain}.txt", "w") as f:
                f.write(plan)
    print(json.dumps({"mode": "noop" if args.noop else "count",
                      "sf_dir": args.sf_dir, "cpus": cpus,
                      "repeats": args.repeats,
                      "queries": timings, "samples": samples,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
