"""Plan-shape gates for the sampling and retrieval operators: the
sample membership must stay row-local (no shuffle), the bottom-k must
compile to partial top-k (never a global sort), and the retrieval joins
must broadcast their dictionary-sized sides.
"""

from __future__ import annotations

from t_spoon_spark.plans.explain import count_shuffles, executed_plan, has_broadcast_join
from tests.conftest import SF_SMALL


def test_bernoulli_sample_no_shuffle(spark):
    from t_spoon_spark.queries.sampling import sample_bernoulli_docs

    df = sample_bernoulli_docs(spark, SF_SMALL)
    # the hash gate is a scan-stage filter; only the final orderBy may
    # exchange
    assert count_shuffles(df) <= 1, executed_plan(df)
    plan = executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_split_assignment_single_aggregate_shuffle(spark):
    from t_spoon_spark.queries.sampling import sample_train_val_test_split

    df = sample_train_val_test_split(spark, SF_SMALL)
    # the split gate is row-local codegen; the only exchanges are the
    # 3-group aggregate (with map-side partial) and the tiny orderBy
    assert count_shuffles(df) <= 2, executed_plan(df)
    plan = executed_plan(df)
    assert "partial" in plan.lower(), plan  # map-side combine present
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_reservoir_priority_partial_topk(spark):
    from t_spoon_spark.queries.sampling import sample_reservoir_priority

    df = sample_reservoir_priority(spark, SF_SMALL)
    plan = executed_plan(df)
    # bottom-k must be TakeOrderedAndProject (per-partition partial
    # top-k), not a global Sort over the corpus
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_broadcasts_queries_no_cartesian_on_postings(spark):
    from t_spoon_spark.queries.retrieval import text_bm25_search

    df = text_bm25_search(spark, SF_SMALL)
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    # the only cross joins are the broadcast scalar totals (1-row
    # frames); the postings join itself must be an equi-join on term
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_tfidf_broadcast_df_join(spark):
    from t_spoon_spark.queries.retrieval import text_tfidf_top_terms

    df = text_tfidf_top_terms(spark, SF_SMALL)
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
