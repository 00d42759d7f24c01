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

Known limitation (ADVICE r6): entries that RETURN a materialize()'d
frame (the iterative graph/dedup/clustering families) present here as
LocalTableScan — their per-round INNER plans are invisible to
``executed_plan`` on the returned DataFrame, so an anti-pattern inside
an iteration would not trip this sweep.  Those inner plans are pinned
by the per-family plan tests (test_plans*.py assert the per-iteration
join strategies and exchange counts directly on the loop bodies).
"""

from __future__ import annotations

from t_spoon_spark.plans.explain import executed_plan
from t_spoon_spark.registry import all_queries
from tests.conftest import SF_SMALL


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
