#!/usr/bin/env python
"""Generate a larger scale factor from the driver's sf0.1 testdata.

The driver ships deterministic parquet at sf{0.001,0.01,0.1} (read-only,
TESTDATA.md); nothing above sf0.1 exists, but VERDICT r2's top ask is a
>=sf1.0 datapoint so per-query scaling ratios can distinguish a
scale-correct plan from a lucky one. This script replicates sf0.1 R
times (default 10 -> sf1.0) into a repo-local dir with key offsets that
preserve every cross-table relationship:

- ``customer/supplier/part/orders/lineitem``: every key column is
  offset by ``replica * (max_key + 1)`` with the SAME modulus on both
  sides of each FK (o_custkey moves with c_custkey, l_orderkey with
  o_orderkey, ...), so join fan-outs scale linearly, never
  quadratically.
- ``events.user_id`` moves with ``c_custkey`` (events->customer FK);
  ``ts`` keeps its range, so sessionization sees 10x users with
  unchanged per-user session shape.
- ``documents``: replica i > 0 rewrites ~half the words (those with an
  even crc32) by suffixing the replica tag. The map is a pure function
  of the word, applied uniformly inside a replica, so within-replica
  near-duplicate pairs keep their Jaccard similarity while
  cross-replica copies of the same doc share <~35% of unigrams and
  <~15% of 3-gram shingles -- dedup candidate counts scale ~R, not R^2.
- ``embeddings``: replica i circularly shifts every vector's
  dimensions by i. A coordinate permutation is orthogonal, so all
  within-replica cosines/norms are EXACTLY preserved while
  cross-replica copies decorrelate; the ANN query set (vec_id < 10)
  stays fixed as the corpus grows -- the scaling scenario that matters.
- ``region/nation``: fixed dimensions, copied as-is (TPC-H keeps these
  constant across SFs too).

Fully deterministic (no RNG; crc32 word hashing only). Writes one
row-group batch per replica through a single ParquetWriter per table,
so peak memory is one sf0.1 table regardless of R.

Usage: python scripts/gen_scale.py [--base /root/testdata/sf0.1]
           [--out .testdata/sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> modulus family; every column in a family shares one
# offset so FKs stay aligned across tables
KEY_FAMILIES = {
    "cust": ["c_custkey", "o_custkey", "user_id"],
    "supp": ["s_suppkey", "l_suppkey"],
    "part": ["p_partkey", "l_partkey"],
    "order": ["o_orderkey", "l_orderkey"],
    "event": ["event_id"],
    "doc": ["doc_id"],
    "vec": ["vec_id"],
}

COPY_TABLES = ("region", "nation")
OFFSET_TABLES = ("customer", "supplier", "part", "orders", "lineitem", "events")


def _family_of(col: str) -> str | None:
    for fam, cols in KEY_FAMILIES.items():
        if col in cols:
            return fam
    return None


def _moduli(base: str) -> dict[str, int]:
    """max+1 per key family, computed from the base tables."""
    out: dict[str, int] = {}
    probe = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    for fam, (table, col) in probe.items():
        t = pq.read_table(os.path.join(base, f"{table}.parquet"), columns=[col])
        out[fam] = int(pc.max(t.column(0)).as_py()) + 1
    return out


def _offset_batch(table: pa.Table, moduli: dict[str, int], i: int) -> pa.Table:
    cols = []
    for name, col in zip(table.column_names, table.columns):
        fam = _family_of(name)
        if fam is not None and i > 0:
            col = pc.add(col, pa.scalar(i * moduli[fam], type=col.type))
        cols.append(col)
    return pa.table(dict(zip(table.column_names, cols)), schema=table.schema)


def _perturb_documents(table: pa.Table, i: int) -> pa.Table:
    """Replica-keyed word rewrite; see module docstring."""
    if i == 0:
        return table
    tag = f"r{i}"
    texts = table.column("text").to_pylist()
    new_texts = []
    for t in texts:
        if t is None:
            new_texts.append(None)
            continue
        words = t.split(" ")
        new_texts.append(
            " ".join(
                w + tag if zlib.crc32(w.encode()) % 2 == 0 else w
                for w in words
            )
        )
    arrays = {}
    for name in table.column_names:
        if name == "text":
            arrays[name] = pa.array(new_texts, type=pa.string())
        elif name == "n_chars":
            arrays[name] = pa.array(
                [None if t is None else len(t) for t in new_texts],
                type=pa.int64(),
            )
        else:
            arrays[name] = table.column(name)
    return pa.table(arrays, schema=table.schema)


def _roll_embeddings(table: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return table
    col = table.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    dim = len(col[0])
    # guard against ragged lists: reshape(-1, dim) only errors when the
    # TOTAL length isn't a multiple of dim — mixed lengths that happen
    # to sum right would silently roll values across document
    # boundaries. Check per-row lengths explicitly (offsets diff).
    import pyarrow.compute as pc

    lengths = pc.list_value_length(col)
    if pc.any(pc.not_equal(lengths, dim)).as_py():
        bad = pc.count_distinct(lengths).as_py()
        raise ValueError(
            f"embeddings are ragged ({bad} distinct lengths, expected "
            f"all {dim}); refusing to roll across document boundaries"
        )
    flat = np.asarray(col.flatten(), dtype=np.float32).reshape(-1, dim)
    rolled = np.roll(flat, i % dim, axis=1)
    new = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (len(flat) + 1) * dim, dim), type=pa.int32()),
        pa.array(rolled.ravel(), type=pa.float32()),
    ).cast(table.schema.field("embedding").type)
    arrays = {
        name: (new if name == "embedding" else table.column(name))
        for name in table.column_names
    }
    return pa.table(arrays, schema=table.schema)


def generate(base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    moduli = _moduli(base)

    for name in COPY_TABLES:
        src = pq.read_table(os.path.join(base, f"{name}.parquet"))
        pq.write_table(src, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied {src.num_rows} rows")

    specials = {
        "documents": _perturb_documents,
        "embeddings": _roll_embeddings,
    }
    for name in OFFSET_TABLES + tuple(specials):
        src = pq.read_table(os.path.join(base, f"{name}.parquet"))
        dst = os.path.join(out, f"{name}.parquet")
        with pq.ParquetWriter(dst, src.schema) as w:
            for i in range(factor):
                rep = _offset_batch(src, moduli, i)
                if name in specials:
                    rep = specials[name](rep, i)
                w.write_table(rep)
        print(f"{name}: {src.num_rows} -> {src.num_rows * factor} rows")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/root/testdata/sf0.1")
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             ".testdata", "sf1.0"),
    )
    p.add_argument("--factor", type=int, default=10)
    a = p.parse_args()
    generate(a.base, a.out, a.factor)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
