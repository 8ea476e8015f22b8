#!/usr/bin/env python
"""Hot-key skew probe for the verification kernel's single-key re-keys
(r16, VERDICT r15 #5 / "What's wrong" #3).

The r15 shuffle cuts re-key the pair frame by ``doc_a`` alone
(`repartition(doc_a).dropDuplicates`) and by ``doc_b`` alone before
the right element join — trading AQE skew-join splitting (not
applicable to REPARTITION_BY_COL shuffles) for one less pair-scale
exchange. The no-skew argument: per-doc candidate fan-out is
band-bucket-bounded. This probe tests that argument with the worst
case it is supposed to cover — ONE document duplicated at 1-10 % of
the corpus (a mega-duplicated boilerplate page), which makes every
copy collide in every band and the pair frame quadratic in the copy
count.

For each dup rate it runs the real miner+verify chain
(`shingle_rows` → `minhash_lsh_pairs_rows`) on a synthetic corpus and
reports, for every stage, max vs median task duration and shuffle
read — the VERDICT's decision rule is "salt if max > 2x median task
time" ON THE RE-KEYED STAGES.

Usage:
  python scripts/probe_verify_hotkey_skew.py [--docs N] [--rates a,b]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import urllib.request

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
from mldag_spark.session import recommended_session_confs  # noqa: E402


def rest(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main() -> int:
    docs = 20_000
    rates = [0.01, 0.03, 0.10]
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            docs = int(sys.argv[i + 1])
        if a == "--rates":
            rates = [float(x) for x in sys.argv[i + 1].split(",")]

    from pyspark.sql import SparkSession

    port = 4053
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-hotkey-skew-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from mldag_spark.functions import shingle_rows
    from mldag_spark.operators.dedup import minhash_lsh_pairs_rows

    out = {"docs": docs, "rates": {}}
    for rate in rates:
        k = max(2, int(docs * rate))
        # docs 0..k-1 share one text (the hot near-dup cluster); the
        # rest are unique. ~40 distinct shingles per doc.
        corpus = spark.range(docs).selectExpr(
            "id AS doc_id",
            f"""CASE WHEN id < {k}
                THEN concat('hot hot ', repeat('dup page boiler text ', 10),
                            ' tail')
                ELSE concat('doc ', cast(id AS string), ' ',
                            repeat(concat(sha2(cast(id AS string), 256),
                                          ' '), 8))
                END AS text""",
        )
        rows = shingle_rows(corpus, "doc_id", "text", 3)
        pairs = minhash_lsh_pairs_rows(rows, "doc_id", "shingle")
        spark.sparkContext.setJobDescription(f"hotkey rate={rate}")
        stages_before = {s["stageId"] for s in
                         rest(port, f"applications/{app_id}/stages")}
        t0 = time.time()
        err, n_pairs = None, None
        try:
            n_pairs = pairs.count()
        except Exception as e:
            err = str(e)[:300]
        wall = round(time.time() - t0, 3)

        stage_stats = []
        try:
            for s in rest(port, f"applications/{app_id}/stages?details=false"):
                if s["stageId"] in stages_before or s["status"] != "COMPLETE":
                    continue
                try:
                    tl = rest(
                        port,
                        f"applications/{app_id}/stages/{s['stageId']}/"
                        f"{s['attemptId']}/taskList?length=1000",
                    )
                except Exception:
                    continue
                durs = [t.get("duration", 0) for t in tl
                        if t.get("status") == "SUCCESS"]
                reads = [
                    t.get("taskMetrics", {})
                    .get("shuffleReadMetrics", {})
                    .get("localBytesRead", 0)
                    + t.get("taskMetrics", {})
                    .get("shuffleReadMetrics", {})
                    .get("remoteBytesRead", 0)
                    for t in tl if t.get("status") == "SUCCESS"
                ]
                if len(durs) < 2:
                    continue
                med_d = statistics.median(durs)
                med_r = statistics.median(reads)
                stage_stats.append({
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "tasks": len(durs),
                    "dur_max_ms": max(durs),
                    "dur_med_ms": med_d,
                    "dur_ratio": round(max(durs) / max(med_d, 1), 2),
                    "read_max": max(reads),
                    "read_med": med_r,
                    "read_ratio": round(max(reads) / max(med_r, 1), 2),
                })
        except Exception as e:
            stage_stats = [{"error": str(e)[:200]}]

        worst = max(
            (s for s in stage_stats if "dur_ratio" in s),
            key=lambda s: s["dur_ratio"],
            default=None,
        )
        out["rates"][str(rate)] = {
            "hot_copies": k,
            "wall_sec": wall,
            "pairs": n_pairs,
            "error": err,
            "worst_stage": worst,
            "stages": sorted(
                [s for s in stage_stats if "dur_ratio" in s],
                key=lambda s: -s["dur_ratio"],
            )[:6],
        }
        print(json.dumps({str(rate): out["rates"][str(rate)]["worst_stage"],
                          "wall": wall, "pairs": n_pairs}), flush=True)

    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
