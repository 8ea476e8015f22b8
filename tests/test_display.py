"""Display: DOT structure and the physical explain view."""

from __future__ import annotations

from pyspark.sql import functions as F

import mldag_spark as m
from mldag_spark.display import explain, to_dot


def region_count(df):
    return df.groupBy("r_name").agg(F.count(F.lit(1)).alias("n"))


def test_to_dot_structure():
    dag = m.MLDag()
    n1 = dag["df"] >> m.as_node(region_count)
    n1["result"] >> dag["counts"]
    dot = to_dot(dag)
    assert "digraph" in dot
    assert "region_count" in dot
    assert '"in_df"' in dot and '"out_counts"' in dot


def test_explain_shows_physical_plan(spark, sf_dir):
    dag = m.MLDag()
    n1 = dag["df"] >> m.as_node(region_count)
    n1["result"] >> dag["counts"]
    run = dag.transform(spark.read.parquet(f"{sf_dir}/region.parquet"))
    text = explain(run)
    assert "DAG output: counts" in text
    assert "HashAggregate" in text or "Aggregate" in text
    assert "Scan parquet" in text or "FileScan" in text


def test_dag_explain_physical_view_golden(spark, sf_dir):
    """dag.explain(run) (VERDICT r11 #8): node boundaries in execution
    order, edge annotations on both sides, and one Spark physical plan
    per DataFrame output. The t1-pipeline shape (load -> aggregate ->
    DAG output) is the golden: plan BODIES carry run-varying expr ids,
    so the pin is the annotation skeleton plus load-bearing plan
    content (scan + aggregate), not raw bytes."""
    dag = m.MLDag()
    n1 = dag["df"] >> m.as_node(region_count)
    n2 = m.as_node(double_col)
    n1 >> n2
    n2["result"] >> dag["doubled"]
    run = dag.transform(spark.read.parquet(f"{sf_dir}/region.parquet"))
    text = dag.explain(run)

    lines = text.splitlines()
    assert lines[0].startswith("== MLDag physical view (run ")
    # node sections in execution (topo) order
    i1 = text.index("-- node: region_count --")
    i2 = text.index("-- node: double_col --")
    assert i1 < i2
    # boundary annotations: DAG input feeds node 1, node 1 feeds node
    # 2, node 2 feeds the DAG output
    assert "dag input 'df' -> df" in text
    assert "result -> double_col.df" in text
    assert "region_count.result -> df" in text
    assert "result -> dag output 'doubled'" in text
    # each node's DataFrame output carries a physical plan with the
    # scan at the bottom and the aggregate where the metadata graph
    # promised it
    assert text.count("[result] Spark plan:") == 2
    seg1 = text[i1:i2]
    assert "Scan parquet" in seg1 or "FileScan" in seg1
    assert "HashAggregate" in seg1 or "Aggregate" in seg1


def double_col(df):
    return df.withColumn("n2", F.col("n") * 2)


def _nested_dag():
    inner = m.MLDag()
    i1 = inner["df"] >> m.as_node(region_count)
    i2 = m.as_node(double_col)
    i1 >> i2
    i2["result"] >> inner["doubled"]

    outer = m.MLDag()
    nested = m.MLDagNode(mldag=inner, name="inner_dag")
    o1 = outer["df"] >> nested
    tail = m.as_node(double_col, name="tail")
    o1 >> tail
    tail["result"] >> outer["out"]
    return outer


def test_nested_dag_renders_as_cluster():
    """Golden shape for dag-in-dag rendering (the structure the
    reference pins for nested display): the MLDagNode becomes a
    labeled subgraph cluster containing the inner DAG's nodes, and
    edges route to the inner node bound to the public port."""
    dot = to_dot(_nested_dag())
    assert 'subgraph "cluster_inner_dag"' in dot
    assert "«MLDagNode» inner_dag" in dot
    # inner nodes are path-qualified inside the cluster
    assert '"inner_dag/region_count"' in dot
    assert '"inner_dag/double_col"' in dot
    # no opaque record node for the expanded MLDagNode
    assert '"inner_dag" [label=' not in dot
    # the outer edge into the nested dag lands on the inner input node
    assert '"inner_dag/region_count":in_df' in dot
    # the nested dag's output port feeds the downstream node
    assert '"inner_dag/double_col":out_result -> "tail":in_df' in dot


def test_nested_dag_depth_limit_collapses():
    dot = to_dot(_nested_dag(), max_mldag_depth=0)
    assert "subgraph" not in dot
    assert '"inner_dag" [label=' in dot      # opaque record node
    assert '"inner_dag/region_count"' not in dot


def test_named_styles():
    import pytest

    from mldag_spark import display

    assert set(display.available) >= {"default", "dark_background"}
    dot_dark = to_dot(_nested_dag(), style="dark_background")
    assert "#161616" in dot_dark             # dark background applied
    display.use("dark_background")
    try:
        assert to_dot(_nested_dag()).count("#161616") == 1
    finally:
        display.use("default")
    with pytest.raises(KeyError):
        display.use("no_such_style")


def test_style_yaml_loading_matches_embedded():
    """The YAML style resources (reference file contract:
    mldag/style/__init__.py:1-25) must parse to exactly the embedded
    palettes, and use()/current() must share state with display."""
    from mldag_spark import display, style

    assert style.available == ["dark_background", "default"]
    for name in style.available:
        assert style.get(name) == display.STYLES[name]

    style.use("dark_background")
    try:
        assert style.current() == display.STYLES["dark_background"]
        assert display.current() == display.STYLES["dark_background"]
    finally:
        style.use(style.DEFAULT_STYLE)

    import pytest

    with pytest.raises(KeyError):
        display.use("no_such_style")


def test_pipeline_clean_pack_physical_view_golden(spark, sf_dir):
    """VERDICT r12 #8: the composed end-to-end pipeline's physical
    view — six node sections in execution order, each stage boundary
    annotated, and the load-bearing plan content where the design
    says it must be: the parquet scan under the clean stage, the
    dedup ranking window, the decontamination join, and the pack
    prefix-sum window."""
    from mldag_spark.queries.dag_pipeline import build_clean_pack_dag

    dag = build_clean_pack_dag(spark)
    run = dag.transform(sf_dir)
    text = dag.explain(run)

    order = [
        "-- node: docs_src --",
        "-- node: clean --",
        "-- node: dedup_exact --",
        "-- node: quality_gate --",
        "-- node: decontaminate --",
        "-- node: pack --",
    ]
    idx = [text.index(sec) for sec in order]
    assert idx == sorted(idx), "node sections out of execution order"
    assert "dag input 'sf_dir' -> sf_dir" in text
    assert "result -> dag output 'packed_corpus'" in text
    # one Spark physical plan per node output
    assert text.count("Spark plan:") == len(order)
    seg = dict(zip(order, [text[a:b] for a, b in zip(idx, idx[1:] + [len(text)])]))
    assert ("Scan parquet" in seg["-- node: docs_src --"]
            or "FileScan" in seg["-- node: docs_src --"])
    assert "Window" in seg["-- node: dedup_exact --"]
    assert ("SortMergeJoin" in seg["-- node: decontaminate --"]
            or "Join" in seg["-- node: decontaminate --"])
    assert "Window" in seg["-- node: pack --"]


def test_pipeline_fit_apply_physical_view_golden(spark, sf_dir):
    """VERDICT r13 #6: the train/test FIT pipeline's physical view —
    nine node sections in execution order through the scheduler
    (estimator fitted on train BEFORE the TransformNode applies it to
    the held-out test split), with the load-bearing plan content in
    the right stages: the parquet scan under the source, the
    content-hash dedup window, and the lang-keyed aggregate under the
    stats leaf."""
    from mldag_spark.queries.dag_pipeline import build_fit_apply_dag

    dag = build_fit_apply_dag(spark)
    run = dag.fit_transform(sf_dir)
    text = dag.explain(run)

    order = [
        "-- node: docs_src --",
        "-- node: clean --",
        "-- node: dedup_exact --",
        "-- node: featurize --",
        "-- node: train_split --",
        "-- node: test_split --",
        "-- node: scaler --",
        "-- node: scaler_test --",
        "-- node: test_stats --",
    ]
    idx = [text.index(sec) for sec in order]
    assert idx == sorted(idx), "node sections out of execution order"
    assert "dag input 'sf_dir' -> sf_dir" in text
    assert "result -> dag output 'fit_apply_stats'" in text
    assert text.count("Spark plan:") == len(order)
    seg = dict(
        zip(order, [text[a:b] for a, b in zip(idx, idx[1:] + [len(text)])])
    )
    assert ("Scan parquet" in seg["-- node: docs_src --"]
            or "FileScan" in seg["-- node: docs_src --"])
    assert "Window" in seg["-- node: dedup_exact --"]
    assert "HashAggregate" in seg["-- node: test_stats --"]


def test_pipeline_fuzzy_dedup_physical_view_golden(spark, sf_dir):
    """r15 (VERDICT r14 #2): the DAG-composed fuzzy-dedup chain's
    physical view — four node sections in execution order with the
    source fanning out to three consumers, and the load-bearing plan
    content per stage: the parquet scan under the source, the LSH
    band self-join under the miner, the JVM levenshtein kernel under
    the verifier, and the keep-best anti-join under the selection."""
    from mldag_spark.queries.dag_pipeline import build_fuzzy_dedup_dag

    dag = build_fuzzy_dedup_dag(spark)
    run = dag.transform(sf_dir)
    text = dag.explain(run)

    order = [
        "-- node: docs_src --",
        "-- node: mine_lsh --",
        "-- node: verify_edit --",
        "-- node: keep_best --",
    ]
    idx = [text.index(sec) for sec in order]
    assert idx == sorted(idx), "node sections out of execution order"
    assert "dag input 'sf_dir' -> sf_dir" in text
    assert "result -> dag output 'survivors'" in text
    assert text.count("Spark plan:") == len(order)
    seg = dict(
        zip(order, [text[a:b] for a, b in zip(idx, idx[1:] + [len(text)])])
    )
    assert ("Scan parquet" in seg["-- node: docs_src --"]
            or "FileScan" in seg["-- node: docs_src --"])
    assert "Join" in seg["-- node: mine_lsh --"]
    assert "levenshtein" in seg["-- node: verify_edit --"]
    assert ("LeftAnti" in seg["-- node: keep_best --"]
            or "Join" in seg["-- node: keep_best --"])
