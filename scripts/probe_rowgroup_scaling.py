#!/usr/bin/env python
"""Multi-row-group layout scaling probe (r16, VERDICT r15 #6).

The driver's 8-vs-32-cpu scaling block reads 1.46-1.92 for the
scan-bound headline queries, and the r15 attribution is INPUT LAYOUT:
every sf parquet table is a single file with a SINGLE ROW GROUP
(pyarrow-verified: lineitem sf0.1 = 600k rows, 1 row group), so every
scan is one task at any core count. The test data is driver-owned —
the engine cannot re-layout it for the bench — but the engine's own
``sources.write_sorted_layout`` produces the layout a production
deployment would use. This probe PROVES the attribution: it rewrites
lineitem/orders at sf0.1 through write_sorted_layout (32 range files,
sorted within), builds an alternate sf dir (other tables symlinked),
and times the UNMODIFIED q1/q10 builders against both layouts at 8
and 32 cores (one subprocess session per core count).

Expected: plain layout scales ~1.5-1.9x from 8->32 cpus; the re-laid
corpus >= 2.5x (the VERDICT's done-bar), same results.

Usage:
  python scripts/probe_rowgroup_scaling.py            # orchestrate
  python scripts/probe_rowgroup_scaling.py --one CPUS SF_DIR  # worker
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

QUERIES = ("q1_pricing_summary", "q10_returned_items")


def worker(cpus: str, sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    from mldag_spark.session import recommended_session_confs

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rowgroup-scaling-worker")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
        # row checksum so the layouts are proven result-identical
        rows = sorted(
            tuple(str(x) for x in r) for r in fn(spark, sf_dir).collect()
        )
        import hashlib

        out[name] = {
            "min_sec": min(walls),
            "runs": walls,
            "rows_sha": hashlib.sha256(str(rows).encode()).hexdigest()[:16],
        }
    print("WORKER_RESULT " + json.dumps(out))
    spark.stop()
    return 0


def main() -> int:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        return worker(sys.argv[i + 1], sys.argv[i + 2])

    src = "/root/testdata/sf0.1"
    work = "/tmp/sf0.1_rowgrouped"
    for i, a in enumerate(sys.argv):
        if a == "--src":
            src = sys.argv[i + 1]
        if a == "--work":
            work = sys.argv[i + 1]
    if not os.path.isdir(work):
        from pyspark.sql import SparkSession

        from mldag_spark.session import recommended_session_confs
        from mldag_spark.sources import write_sorted_layout

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("rowgroup-scaling-writer")
            .config(map=recommended_session_confs())
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        os.makedirs(work, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            dst = f"{work}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{src}/{t}.parquet", dst)
        write_sorted_layout(
            spark.read.parquet(f"{src}/lineitem.parquet"),
            f"{work}/lineitem.parquet", ["l_shipdate"], n_files=32,
            sort_within=["l_shipdate", "l_orderkey"],
        )
        write_sorted_layout(
            spark.read.parquet(f"{src}/orders.parquet"),
            f"{work}/orders.parquet", ["o_orderdate"], n_files=32,
            sort_within=["o_orderdate", "o_orderkey"],
        )
        spark.stop()

    results = {}
    me = os.path.abspath(__file__)
    for layout, sf in (("plain", src), ("rowgrouped", work)):
        for cpus in ("8", "32"):
            p = subprocess.run(
                [sys.executable, me, "--one", cpus, sf],
                capture_output=True, text=True, timeout=900,
            )
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("WORKER_RESULT ")]
            results[f"{layout}_c{cpus}"] = (
                json.loads(line[0][len("WORKER_RESULT "):])
                if line else {"error": p.stderr[-400:]}
            )
            print(json.dumps({f"{layout}_c{cpus}":
                              results[f"{layout}_c{cpus}"]}), flush=True)

    summary = {}
    for layout in ("plain", "rowgrouped"):
        for q in QUERIES:
            try:
                t8 = results[f"{layout}_c8"][q]["min_sec"]
                t32 = results[f"{layout}_c32"][q]["min_sec"]
                summary[f"{layout}:{q}"] = {
                    "c8": t8, "c32": t32,
                    "scaling_8_to_32": round(t8 / t32, 2),
                    "rows_match_across_cpus": (
                        results[f"{layout}_c8"][q]["rows_sha"]
                        == results[f"{layout}_c32"][q]["rows_sha"]
                    ),
                }
            except (KeyError, TypeError):
                summary[f"{layout}:{q}"] = {"error": "worker failed"}
    # identical results across LAYOUTS too
    for q in QUERIES:
        try:
            summary[f"rows_match_across_layouts:{q}"] = (
                results["plain_c32"][q]["rows_sha"]
                == results["rowgrouped_c32"][q]["rows_sha"]
            )
        except (KeyError, TypeError):
            pass
    print(json.dumps({"summary": summary}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
