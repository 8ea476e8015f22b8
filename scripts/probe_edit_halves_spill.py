#!/usr/bin/env python
"""Forced-spill probe for the edit-verify pair-assembly join (r16,
VERDICT r15 #1).

The `edit_similarity_pairs` halves join co-locates each candidate
pair's two document texts. As a sort-merge join BOTH sides' sorts
carry full document text (pair-duplicated) — the spill class that
OOMed once at sf0.1 in r15 (UnsafeSorterSpillReader read-ahead, 32
concurrent text-carrying sorts on a 1 GiB heap). This probe builds a
synthetic corpus big enough that the assembly join CANNOT fit in the
default local heap, then runs the pair-assembly shape:

  - mode=merge         the r15 shape (SMJ, text in both sorts)
  - mode=shuffle_hash  the r16 shape (SHJ, no sorts; build side =
                       the distinct-pair half)
  - mode=operator      whatever `operators.dedup.edit_similarity_pairs`
                       currently ships (end-to-end evidence)

and reports wall seconds, completion, and the executor spill/peak
metrics from the UI REST API. The projection after the join is a
cheap length/hash fold, NOT levenshtein — the probe times the join
machinery, not the DP (which is per-pair CPU, irrelevant to spill).

Usage:
  python scripts/probe_edit_halves_spill.py [--docs N] [--kb K]
      [--fanout F] [--modes merge,shuffle_hash,operator]
"""

from __future__ import annotations

import json
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
    docs = 40_000
    kb = 8
    fanout = 4
    modes = ["merge", "shuffle_hash", "operator"]
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            docs = int(sys.argv[i + 1])
        if a == "--kb":
            kb = int(sys.argv[i + 1])
        if a == "--fanout":
            fanout = int(sys.argv[i + 1])
        if a == "--modes":
            modes = sys.argv[i + 1].split(",")

    from pyspark.sql import SparkSession, functions as F

    port = 4052
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("edit-halves-spill-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # Synthetic corpus: ~kb KiB of deterministic text per doc. repeat()
    # of a per-doc seed keeps generation cheap and rows incompressible
    # enough that shuffle compression does not erase the volume.
    texts = spark.range(docs).selectExpr(
        "id AS doc_id",
        f"repeat(concat(sha2(cast(id AS string), 256), ' '), "
        f"{kb * 1024 // 65}) AS text",
    )
    # fan-out f: doc i pairs with i+1..i+f (wrapping), plus a scalar
    # metric column riding along like the miner's jaccard
    pairs = (
        spark.range(docs)
        .selectExpr(
            "id AS doc_a",
            f"explode(sequence(1, {fanout})) AS _k",
        )
        .selectExpr(
            "doc_a",
            f"pmod(doc_a + _k, {docs}) AS doc_b",
            "cast(0.9 as double) AS jaccard",
        )
    )

    def assemble(mode: str):
        if mode == "operator":
            from mldag_spark.operators.dedup import edit_similarity_pairs

            out = edit_similarity_pairs(
                pairs, texts, id_col="doc_id", text_col="text"
            )
            # aggregate so the noop sink is not the bottleneck
            return out.groupBy().agg(
                F.count("*").alias("n"), F.sum("edit_sim").alias("s")
            )
        p = pairs.localCheckpoint(eager=False)
        a = texts.selectExpr("doc_id AS doc_a", "text AS _ta")
        b = texts.selectExpr("doc_id AS doc_b", "text AS _tb")
        wa = a.join(F.broadcast(p), "doc_a")
        wb = b.join(F.broadcast(p.select("doc_a", "doc_b").distinct()),
                    "doc_b")
        if mode == "shuffle_hash":
            wb = wb.hint("shuffle_hash")
        elif mode == "merge":
            wb = wb.hint("merge")
        both = wa.join(wb, ["doc_a", "doc_b"])
        # cheap stand-in for the levenshtein projection: touch both
        # text columns, return a bounded long (pmod keeps the ANSI sum
        # from overflowing)
        return both.selectExpr(
            "pmod(xxhash64(_ta) ^ xxhash64(_tb), 1000003) AS h"
        ).groupBy().agg(F.sum("h").alias("s"), F.count("*").alias("n"))

    results = {}
    for mode in modes:
        spark.sparkContext.setJobDescription(f"halves {mode}")
        stages_before = {s["stageId"] for s in
                         rest(port, f"applications/{app_id}/stages")}
        t0 = time.time()
        err = None
        plan = ""
        row = None
        try:
            df = assemble(mode)
            row = df.collect()[0]
            wall = round(time.time() - t0, 3)
            # capture the FINAL adaptive plan (post-execution)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            wall = round(time.time() - t0, 3)
            err = str(e)[:400]
        spill_mem = spill_disk = 0
        try:
            for s in rest(port, f"applications/{app_id}/stages"):
                if s["stageId"] in stages_before:
                    continue
                spill_mem += s.get("memoryBytesSpilled", 0)
                spill_disk += s.get("diskBytesSpilled", 0)
        except Exception:
            pass
        results[mode] = {
            "wall_sec": wall,
            "ok": err is None,
            "error": err,
            "rows": (row["n"] if row is not None else None),
            "check": (str(row["s"]) if row is not None else None),
            "memoryBytesSpilled": spill_mem,
            "diskBytesSpilled": spill_disk,
            "n_sorts_in_plan": plan.count("Sort "),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
        }
        print(json.dumps({mode: results[mode]}), flush=True)

    print(json.dumps({
        "docs": docs, "kb": kb, "fanout": fanout, "results": results,
    }, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
