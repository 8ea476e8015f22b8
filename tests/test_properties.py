"""Property-based tests (hypothesis) — beyond the reference's
literal-value test strategy (SURVEY §5: it has none).

Spark session startup dominates, so properties run on small generated
inputs with a shared session and bounded example counts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from mldag_spark.functions import shingle_sets

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcdef", min_size=1, max_size=4)
docs = st.lists(words, min_size=1, max_size=12)


def _naive_shingle_set(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) <= k:
        return {" ".join(tokens)}
    return {" ".join(tokens[i: i + k]) for i in range(len(tokens) - k + 1)}


@given(doc=docs)
@_settings
def test_shingle_sets_matches_naive(spark, doc):
    text = " ".join(doc)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = set(shingle_sets(df, "doc_id", "text", 3).first()["sh"])
    assert got == _naive_shingle_set(doc, 3)


@given(
    data=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(1, 9),
)
@_settings
def test_salted_aggregate_always_exact(spark, data, n_salts):
    from pyspark.sql import functions as F

    from mldag_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(data, ["k", "v"])
    got = {
        r["k"]: (r["total"], r["n"])
        for r in salted_aggregate(
            df, ["k"], {"total": ("sum", "v"), "n": ("count", F.lit(1))},
            n_salts=n_salts,
        ).collect()
    }
    want: dict[str, tuple[int, int]] = {}
    for k, v in data:
        t, n = want.get(k, (0, 0))
        want[k] = (t + v, n + 1)
    assert got == want


@given(
    sets=st.lists(
        st.sets(st.integers(0, 30), min_size=1, max_size=10),
        min_size=2,
        max_size=6,
    )
)
@_settings
def test_minhash_lsh_no_false_positives(spark, sets):
    """Whatever the banding emits, verification guarantees every
    reported pair truly meets the Jaccard threshold."""
    from mldag_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, [str(x) for x in s]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, ["doc_id", "sh"])
    out = minhash_lsh_pairs(
        df, "doc_id", "sh", threshold=0.6, num_hashes=16, bands=4
    ).collect()
    for r in out:
        a, b = set(sets[r["doc_a"]]), set(sets[r["doc_b"]])
        true_j = len(a & b) / len(a | b)
        assert true_j >= 0.6
        assert abs(r["jaccard"] - round(true_j, 4)) < 1e-9


@given(n_parts=st.integers(1, 12))
@_settings
def test_deterministic_split_partition_invariant(spark, n_parts):
    """The md5-bucket split assignment must be identical at any
    partitioning — the reproducibility contract that rand()-based
    sampling cannot give."""
    from mldag_spark.queries import REGISTRY

    base = REGISTRY["sample_deterministic_split"](
        spark, "/root/testdata/sf0.001"
    )
    got = {
        (r["split"], r["lang"]): r["n_docs"] for r in base.collect()
    }
    # recompute after forcing a different physical layout
    from pyspark.sql import functions as F

    from mldag_spark.queries.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents").repartition(n_parts)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    re = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    }
    assert re == got


def test_gate_queries_shuffle_partition_invariant(spark):
    """Money aggregates, sessionization, and the multilevel rollup
    claim partition-invariant results (exact DECIMAL partials, content
    hashes). Re-running at a very different shuffle-partition count
    must produce byte-identical sorted rows."""
    from mldag_spark.queries import REGISTRY

    names = (
        "q1_pricing_summary",
        "events_sessionization",
        "events_multilevel_rollup",
        "sample_kfold_assignment",
    )
    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_parts in ("3", old):
            spark.conf.set("spark.sql.shuffle.partitions", n_parts)
            for name in names:
                df = REGISTRY[name](spark, sf)
                rows = sorted(
                    tuple(r) for r in df.collect()
                )
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across shuffle partition counts"


def test_r6_ops_shuffle_partition_invariant(spark):
    """The r6 additions claim partition-invariant results (integer
    counts, hash keys, exact-operand divisions): byte-identical sorted
    rows at a very different shuffle-partition count."""
    from mldag_spark.queries import REGISTRY

    names = (
        "text_boilerplate_chunks",
        "text_bigram_surprisal",
        "events_transition_matrix",
        "dq_orphan_audit",
    )
    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_parts in ("3", old):
            spark.conf.set("spark.sql.shuffle.partitions", n_parts)
            for name in names:
                rows = sorted(
                    tuple(r) for r in REGISTRY[name](spark, sf).collect()
                )
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across shuffle partition counts"


def test_boilerplate_chunks_mass_conservation(spark):
    """Every document's chunk accounting must close: n_chunks =
    floor(n_tokens/4), 0 <= boiler_chunks <= n_chunks, and
    kept_tokens = n_tokens - 4*boiler_chunks."""
    from mldag_spark.queries import REGISTRY

    rows = REGISTRY["text_boilerplate_chunks"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_chunks"] == r["n_tokens"] // 4
        assert 0 <= r["boiler_chunks"] <= r["n_chunks"]
        assert r["kept_tokens"] == r["n_tokens"] - 4 * r["boiler_chunks"]


def test_transition_matrix_probabilities_normalize(spark):
    """Per from_type, conditional probabilities sum to 1 (exact-operand
    division of bigint counts) and transition counts equal
    sum(per-user sequence length - 1)."""
    from pyspark.sql import functions as F

    from mldag_spark.queries import REGISTRY
    from mldag_spark.queries.tables import load

    sf = "/root/testdata/sf0.001"
    df = REGISTRY["events_transition_matrix"](spark, sf)
    sums = df.groupBy("from_type").agg(
        F.sum("p_transition").alias("p"), F.sum("n_transitions").alias("n")
    ).collect()
    assert sums
    for r in sums:
        assert abs(r["p"] - 1.0) < 1e-9
    total = sum(r["n"] for r in sums)
    per_user = (
        load(spark, sf, "events").groupBy("user_id")
        .agg((F.count(F.lit(1)) - 1).alias("m")).collect()
    )
    assert total == sum(r["m"] for r in per_user)


def test_effective_rank_matches_numpy_and_partitioning(spark):
    """embedding_effective_rank is rows-only (no SQL eigensolver):
    pin it against a straight single-process numpy computation on the
    collected vectors, and pin partition invariance of the rounded
    output (4 dp absorbs cross-partition float summation order)."""
    import numpy as np

    from mldag_spark.queries import REGISTRY
    from mldag_spark.queries.tables import load

    sf = "/root/testdata/sf0.001"
    got = {r["stat"]: r["value"] for r in
           REGISTRY["embedding_effective_rank"](spark, sf).collect()}

    m = np.array(
        [r["embedding"] for r in
         load(spark, sf, "embeddings").select("embedding").collect()],
        dtype=np.float64,
    )
    cov = np.cov(m, rowvar=False, bias=True)
    w = np.clip(np.linalg.eigvalsh(cov)[::-1], 0.0, None)
    shares = w / w.sum()
    nz = shares[shares > 0]
    assert got["n_vectors"] == m.shape[0]
    assert got["trace"] == round(float(w.sum()), 4)
    assert got["top1_share"] == round(float(shares[0]), 4)
    assert got["top5_share"] == round(float(shares[:5].sum()), 4)
    assert got["effective_rank"] == round(
        float(np.exp(-(nz * np.log(nz)).sum())), 4
    )

    # different physical layout -> identical rounded output
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {r["stat"]: r["value"] for r in
                 REGISTRY["embedding_effective_rank"](spark, sf).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert again == got


def test_kmeans_partition_invariant_and_exhaustive(spark):
    """The k-means contract: exact decimal distances/updates make the
    result byte-identical at any shuffle-partition count, every vector
    lands in exactly one cluster, and inertia is non-negative."""
    from mldag_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        runs = []
        for n_parts in ("3", old):
            spark.conf.set("spark.sql.shuffle.partitions", n_parts)
            rows = sorted(
                tuple(r)
                for r in REGISTRY["kmeans_embedding_clusters"](
                    spark, sf
                ).collect()
            )
            runs.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    a, b = runs
    assert a == b, "kmeans differs across shuffle partition counts"
    from mldag_spark.queries.tables import load

    n_vecs = load(spark, sf, "embeddings").count()
    assert sum(r[1] for r in a) == n_vecs  # exhaustive, disjoint
    assert all(r[2] >= 0.0 for r in a)


# ---------------------------------------------------------------------------
# Codec fuzz (r12): the stdlib PNG path is load-bearing for image
# decode, resize, and native featurization — round-trip it under
# hypothesis, and prove corruption NEVER crashes the parser with
# anything but the documented ValueError (the kernels map that to
# ok=false; any other exception class would kill a 100 TB pass).
# ---------------------------------------------------------------------------
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
@_settings
def test_png_roundtrip_any_shape(h, w, seed):
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
    )

    px = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    gw, gh, got = _png_parse_gray(png_encode_gray(px))
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, px)


@given(
    seed=st.integers(0, 2**31 - 1),
    cut=st.integers(0, 200),
    flip_at=st.integers(0, 199),
)
@_settings
def test_png_parser_corruption_is_valueerror_never_crash(seed, cut, flip_at):
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
    )

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(png_encode_gray(px))
    # truncate and/or flip one byte somewhere in the container
    if cut < len(data):
        data = data[: len(data) - cut]
    if data and flip_at < len(data):
        data[flip_at] ^= 0xFF
    try:
        gw, gh, got = _png_parse_gray(bytes(data))
        # surviving a mutation is only acceptable if the mutation
        # landed outside every checked region AND the pixels still
        # round-trip exactly (e.g. flip undone by truncation edge)
        assert (gw, gh) == (8, 8) and np.array_equal(got, px)
    except ValueError:
        pass  # the documented failure mode — kernels map it to ok=false


@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 4),
    cut=st.integers(0, 400),
)
@_settings
def test_y4m_roundtrip_and_truncation_is_valueerror(seed, n_frames, cut):
    import numpy as np

    from mldag_spark.operators.multimodal import _y4m_parse, y4m_encode

    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, (8, 10), dtype=np.uint8) for _ in range(n_frames)
    ]
    data = y4m_encode(frames)
    w, h, _fps, lumas = _y4m_parse(data)
    assert (w, h) == (10, 8) and len(lumas) == n_frames
    assert all(np.array_equal(a, b) for a, b in zip(lumas, frames))
    if cut == 0:
        return
    trunc = data[: max(len(data) - cut, 1)]
    try:
        _w2, _h2, _f2, lumas2 = _y4m_parse(trunc)
        # a cut landing exactly on a frame boundary legitimately
        # parses as fewer complete frames — anything else must raise
        assert len(lumas2) < n_frames
    except ValueError:
        pass
