"""Corpus-wide physical-plan anti-pattern sweep: EVERY registry entry
(except the txn_/streaming_ prefixes, whose construction executes the
stateful epoch machinery gated elsewhere) must plan without

- ``CartesianProduct`` — an unconstrained product is the canonical
  100 TB scale-killer; every intended product in the corpus is a
  broadcast of a 1-row aggregate or K-centroid frame, which plans as
  BroadcastNestedLoopJoin, never CartesianProduct;
- ``BatchEvalPython`` — a row-at-a-time pickled Python crossing; every
  Python crossing in the engine is Arrow-batched (ArrowEvalPython,
  FlatMapGroupsInPandas, MapInPandas/Arrow, ArrowEvalPythonUDTF).

Per-entry plan tests (test_plans*.py) pin stronger per-operator claims
(broadcasts, pushdown, partial aggregation); this sweep guarantees the
two global invariants hold for the WHOLE corpus, including every entry
added later — a new query with a cartesian or a pickled UDF fails CI
here, not the cluster bill.

Known limitation (ADVICE r6): entries whose loop bodies materialize()
intermediates (connected components' per-round labels, k-means'
per-iteration centroids) present those interiors as LocalTableScan /
checkpoint scans — an anti-pattern INSIDE such a loop would not trip
this sweep.  Coverage for those interiors: PageRank and the candidate
pipelines build their loops as one lazy plan (fully visible here);
test_plan_iterative_inner_bodies below sweeps one representative
inner-round plan for the label-propagation and k-means loop shapes
directly.
"""

from __future__ import annotations

from t_spoon_spark.plans.explain import executed_plan
from t_spoon_spark.registry import all_queries
from tests.conftest import SF_SMALL


def test_plan_iterative_inner_bodies(spark):
    """Sweep the INNER round plans of the loop-shaped families — built
    from the modules' own loop-body pieces, physical-planned WITHOUT
    the lineage cuts (and without executing anything), so the same two
    global invariants are checked inside the loop bodies the corpus
    sweep cannot see (the docstring's known limitation)."""
    import pyspark.sql.functions as F

    # k-means: one full Lloyd round + the next assignment, via the
    # module's own _assign — exactly what runs between lineage cuts
    from t_spoon_spark.queries.clustering import KM_K, _assign
    from t_spoon_spark.queries.relational import t
    from t_spoon_spark.operators.similarity import int_embedding

    emb = t(spark, SF_SMALL, "embeddings")
    base = emb.select("vec_id", int_embedding("embedding").alias("ei"))
    cents = base.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("ei").alias("ce")
    )
    assigned = _assign(base, cents)
    per_dim = assigned.select("cid", F.posexplode("ei").alias("pos0", "v")).groupBy(
        "cid", "pos0"
    ).agg(F.expr("sum(v) div count(1)").cast("long").alias("m"))
    cents2 = per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "m"))), lambda s: s.m
        ).alias("ce")
    )
    km_round = _assign(base, cents2)

    # connected components: one label-propagation + pointer-jump round
    # (the cluster-path loop body of operators/dedup.connected_components)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (7, 8), (8, 7)], "u long, v long"
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    lab = labels.select(F.col("u").alias("v"), "label")
    nmin = edges.join(lab, "v").groupBy("u").agg(F.min("label").alias("nlabel"))
    stepped = labels.join(nmin, "u", "left").select(
        "u", F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label")
    )
    cc_round = stepped.join(
        stepped.select(F.col("u").alias("label"), F.col("label").alias("label2")),
        "label",
        "left",
    ).select("u", F.coalesce("label2", "label").alias("label"))

    for name, df in (("kmeans_round", km_round), ("cc_round", cc_round)):
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_no_cartesian_no_rowwise_python_anywhere(spark):
    qs = all_queries()
    bad: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if name.startswith(("txn_", "streaming_")):
            continue
        plan = executed_plan(fn(spark, SF_SMALL))
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BatchEvalPython" in plan:  # also matches BatchEvalPythonUDTF
            hits.append("BatchEvalPython")
        if hits:
            bad[name] = hits
    assert not bad, bad
