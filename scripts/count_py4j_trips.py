#!/usr/bin/env python
"""Count py4j round trips per query CONSTRUCTION across the registry.

Deterministic instrumentation (r15 methodology, packaged as a script
for the r16 long-tail construction campaign): patch
``ClientServerConnection.send_command`` with a counter, build each
declared query's DataFrame (no execution), and report the trip count.
gc is collected before each build so deferred py4j detach commands are
charged to the query that created the objects, not the next one.

Usage:
    python scripts/count_py4j_trips.py out.json [--sf DIR] [--only a,b]
"""

from __future__ import annotations

import gc
import json
import os
import sys


def main() -> int:
    out_path = sys.argv[1]
    # trip counts are scale-independent (same schemas, same expression
    # trees); sf0.001 keeps the eager-construction queries (fit nodes,
    # measured-count broadcasts) cheap
    sf_dir = "/root/testdata/sf0.001"
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        if a == "--only":
            only = sys.argv[i + 1].split(",")

    import py4j.clientserver

    counter = [0]
    orig = py4j.clientserver.ClientServerConnection.send_command

    def patched(self, *a, **kw):
        counter[0] += 1
        return orig(self, *a, **kw)

    py4j.clientserver.ClientServerConnection.send_command = patched

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from mldag_spark.session import recommended_session_confs

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("py4j-trip-count")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in recommended_session_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = only if only else list(qs)

    # warm pass: schema cache, module imports, first-touch JVM classes —
    # the steady-state construction cost is what the bench pays after
    # its sf0.001 warmup
    import time

    for name in names:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir)
        except Exception:
            pass
        print(f"warm {name}: {time.time() - t0:.1f}s", file=sys.stderr)

    trips: dict[str, int] = {}
    for name in names:
        try:
            gc.collect()
            c0 = counter[0]
            qs[name](spark, sf_dir)
            gc.collect()
            trips[name] = counter[0] - c0
        except Exception as e:
            print(f"error {name}: {e}", file=sys.stderr)
            trips[name] = -1
        print(f"count {name}: {trips[name]}", file=sys.stderr)

    ordered = dict(
        sorted(trips.items(), key=lambda kv: kv[1], reverse=True)
    )
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "total": sum(v for v in trips.values() if v > 0),
             "trips": ordered},
            f, indent=1,
        )
    print(json.dumps({"total": sum(v for v in trips.values() if v > 0),
                      "top10": dict(list(ordered.items())[:10])}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
