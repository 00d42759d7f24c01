"""Plan-shape gates for the late round-5 operators: graph kernels,
drift statistics, decontamination, and the composed corpus build —
no unintended cartesian products, dictionary-sized sides broadcast,
no Python in the data plane (except the packing fold, which is the
intended Arrow path).
"""

from __future__ import annotations

from t_spoon_spark.plans.explain import executed_plan, has_broadcast_join
from tests.conftest import SF_SMALL


def _no_python(plan: str) -> bool:
    return "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_count_no_cartesian_no_python(spark):
    from t_spoon_spark.queries.graph import graph_triangle_parts

    df = graph_triangle_parts(spark, SF_SMALL)
    plan = executed_plan(df)
    # the single-row totals crossJoin is the only nested-loop allowed;
    # wedge/closure joins must be equi-joins
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan


def test_triangle_numpy_reference_matches_engine(spark):
    """The sf1 oracle alternative (tools/triangle_reference_check.py)
    must agree with the engine exactly at the small gate SF too: DuckDB
    edge build + numpy degree-oriented wedge-close replay vs the Spark
    entry — same counts (round-11 verdict #7, the last oracle-exclusion
    class member)."""
    from t_spoon_spark.queries.graph import graph_triangle_parts
    from tools.triangle_reference_check import reference_counts

    row = graph_triangle_parts(spark, SF_SMALL).collect()[0]
    ref_edges, ref_tris = reference_counts(SF_SMALL)
    assert (row["n_edges"], row["n_triangles"]) == (ref_edges, ref_tris)


def test_pagerank_edges_equijoin_no_python(spark):
    from t_spoon_spark.queries.graph import graph_pagerank_nations

    df = graph_pagerank_nations(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan


def test_drift_broadcasts_dictionary_sides(spark):
    from t_spoon_spark.queries.drift import drift_token_distribution

    df = drift_token_distribution(spark, SF_SMALL)
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    assert _no_python(plan), plan


def test_decontamination_broadcasts_benchmark(spark):
    from t_spoon_spark.queries.chunking import decontamination_ngram_overlap

    df = decontamination_ngram_overlap(spark, SF_SMALL)
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan


def test_corpus_build_v2_no_cartesian_no_python(spark):
    from t_spoon_spark.queries.pipeline import pipeline_corpus_build_v2

    df = pipeline_corpus_build_v2(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan


def test_kmeans_broadcast_assignment(spark):
    from t_spoon_spark.queries.clustering import clustering_kmeans_fixed

    df = clustering_kmeans_fixed(spark, SF_SMALL)
    plan = executed_plan(df)
    # the K-centroid assignment must be a broadcast nested loop (tiny
    # side), never a shuffled cartesian of the corpus
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan
