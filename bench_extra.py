#!/usr/bin/env python
"""Per-query isolation harness (guide §1.4): times individual declared
queries with the noop sink in the same session shape as bench.py, and dumps
``.explain("formatted")`` plans for the round's plan-evidence files.

This file is NOT part of the frozen measurement contract (bench.py is); it
exists so optimization work can time one query at a time, repeat it, and
capture plans without re-running the whole suite.

Usage:
    python bench_extra.py QUERY [QUERY ...] [--repeat N] [--plan OUT.txt]
    python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plan-dir", type=str, default=None,
                    help="write <query>.txt explain(formatted) files here")
    ap.add_argument("--plan-suffix", type=str, default="")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as E

    qs = {**E.queries(), **E.extra_queries()}
    if args.list:
        print("\n".join(qs))
        return

    from trident_spark.session import get_spark

    spark = get_spark(app_name="trident-spark-bench-extra",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # same untimed Arrow warmup as bench.py
    warm = spark.range(0, 4096, 1, 8)
    warm.mapInPandas(lambda it: it, schema="id long").write.format(
        "noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        for _ in range(args.repeat):
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.plan_dir,
                                f"{name}{args.plan_suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
