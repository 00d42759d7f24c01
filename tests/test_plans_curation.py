"""Plan-shape gates for the round-5 curation/similarity operators —
what must survive a 100x scale-up: no cartesian products, broadcast on
the intended small side, no Python in the data plane.
"""

from __future__ import annotations

from t_spoon_spark.plans.explain import executed_plan, has_broadcast_join
from tests.conftest import SF_SMALL


def test_sq8_topk_broadcasts_queries_no_cartesian(spark):
    from t_spoon_spark.queries.similarity import similarity_sq8_topk

    df = similarity_sq8_topk(spark, SF_SMALL)
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan, plan
    # integer SQ8 distance is pure column work — no Python workers
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_boilerplate_fraction_no_cartesian_no_python(spark):
    from t_spoon_spark.queries.curation import dedup_boilerplate_fraction

    df = dedup_boilerplate_fraction(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_repetition_scores_partial_aggregation(spark):
    from t_spoon_spark.queries.curation import text_repetition_scores

    df = text_repetition_scores(spark, SF_SMALL)
    plan = executed_plan(df)
    # the (doc_id, tok) count must partial-aggregate map-side before its
    # shuffle — at 100 TB the exploded token stream is the big frame
    assert "partial_count" in plan or "partial" in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_pii_scrub_single_scan_no_shuffle(spark):
    from t_spoon_spark.plans.explain import count_shuffles
    from t_spoon_spark.queries.curation import text_pii_scrub

    df = text_pii_scrub(spark, SF_SMALL)
    # orderBy adds one exchange; the scrub itself must add none
    assert count_shuffles(df) <= 1, executed_plan(df)


def test_round13_curation_plans_no_cartesian_no_python(spark):
    """The four round-13 curation operators must keep the repo-wide
    scale rules: no cartesian products (the mix-rebalance scalar rides
    a broadcast), no Python in the data plane (pure column algebra)."""
    from t_spoon_spark.queries.curation2 import (
        curation_length_quantile_band,
        curation_mix_rebalance_plan,
        dedup_prefix_hash_groups,
        sample_group_capped,
    )

    for fn in (
        curation_length_quantile_band,
        curation_mix_rebalance_plan,
        sample_group_capped,
        dedup_prefix_hash_groups,
    ):
        plan = executed_plan(fn(spark, SF_SMALL))
        assert "CartesianProduct" not in plan, (fn.__name__, plan)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            fn.__name__,
            plan,
        )


def test_mix_rebalance_broadcasts_scalar_floor(spark):
    """The 1-row floor frame must join by broadcast — at 100 TB the
    per-source totals frame is |sources| rows but the floor must never
    force a shuffle."""
    from t_spoon_spark.queries.curation2 import curation_mix_rebalance_plan

    df = curation_mix_rebalance_plan(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or has_broadcast_join(df), plan


def test_prefix_hash_partial_aggregates(spark):
    """The digest group-by must partial-aggregate map-side — at 100 TB
    the hashed-prefix stream is corpus-sized and the shuffle must carry
    per-partition partials, not raw rows."""
    from t_spoon_spark.queries.curation2 import dedup_prefix_hash_groups

    plan = executed_plan(dedup_prefix_hash_groups(spark, SF_SMALL))
    assert "partial" in plan.lower(), plan


def test_partition_pruned_scan_prunes(spark):
    """The event_type filter must resolve to PartitionFilters on the
    partitioned layout — a post-scan Filter over all partitions would
    defeat the operator's reason to exist (SURVEY Q6: partition pruning
    IS our PartitionOrBcastPartitioner equivalent)."""
    from t_spoon_spark.queries.io_formats2 import io_partition_pruned_scan

    df = io_partition_pruned_scan(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "PartitionFilters: [isnotnull(event_type" in plan or (
        "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    ), plan
    # and the pruned scan must still be a columnar parquet scan
    assert "Scan parquet" in plan, plan
