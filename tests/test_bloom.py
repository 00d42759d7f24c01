"""Bloom-filter semi-join: result identity, selectivity sanity, and
plan shape (bitmap broadcast, no probe-side shuffle before the bit
test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from t_spoon_spark.plans.explain import executed_plan
from tests.conftest import SF_SMALL


def _sides(spark):
    from t_spoon_spark.queries.relational import t

    orders = t(spark, SF_SMALL, "orders")
    cust = (
        t(spark, SF_SMALL, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders, cust


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from t_spoon_spark.operators.bloom import bloom_semi_join

    orders, cust = _sides(spark)
    got = sorted(
        r.o_orderkey for r in bloom_semi_join(orders, cust, "o_custkey").collect()
    )
    want = sorted(
        r.o_orderkey for r in orders.join(cust, "o_custkey", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_is_selective(spark):
    """The bit test alone (before the exact close) must reject most
    non-members — otherwise the bitmap is saturated and the operator
    buys nothing. With ~300 build keys in 2^16 bits, FPP is well under
    1%."""
    from t_spoon_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    orders, cust = _sides(spark)
    bitmap = bloom_build(cust, "o_custkey")
    probed = orders.crossJoin(F.broadcast(bitmap))
    n_pass = probed.filter(
        bloom_might_contain(F.col("words"), F.col("o_custkey"))
    ).count()
    n_true = orders.join(cust, "o_custkey", "left_semi").count()
    n_all = orders.count()
    false_pos = n_pass - n_true
    assert false_pos >= 0
    # FPP bound: k=3, m=65536, n<=450 distinct keys -> p ~ (kn/m)^k ~ 8e-6
    assert false_pos <= max(3, 0.01 * (n_all - n_true)), (
        n_pass,
        n_true,
        n_all,
    )


def test_bloom_plan_broadcasts_bitmap_no_python(spark):
    from t_spoon_spark.operators.bloom import bloom_semi_join

    orders, cust = _sides(spark)
    plan = executed_plan(bloom_semi_join(orders, cust, "o_custkey"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
