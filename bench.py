"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports transactional throughput (bank-transfer workload derived
from the events table) as queries entry "txn_bank_tps" once the
transactional layer lands.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_top_orders",
    "q5_region_revenue",
    "q6_revenue_filter",
    "q10_returned_items",
    "outer_join_order_counts",
    "window_top3_orders_per_customer",
    "rollup_nation_status_revenue",
    "pivot_event_type_values",
    "asof_join_purchase_last_click",
    "sessionization_user_stats",
    "w2_sliding_topk_users",
    "dedup_minhash_lsh",
    "dedup_clusters_connected",
    "similarity_lsh_topk",
    "similarity_sq8_topk",
    "dedup_boilerplate_fraction",
    "text_quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0  # unknown scale tag; timings still valid

    from t_spoon_spark.registry import all_queries
    from t_spoon_spark.session import build_spark

    spark = build_spark(app_name="t_spoon_spark_bench")
    qs = all_queries()

    # session warmup: JVM/codegen/parquet-footer costs land here, not in
    # the first measured query
    qs["q6_revenue_filter"](spark, sf_dir).count()

    timings: dict[str, object] = {}
    total = 0.0
    failed: list[str] = []
    for name in HEADLINE:
        if name not in qs:
            continue
        fn = qs[name]
        # 1 warmup + 3 measured runs: the warmup pays one-time Catalyst
        # planning + whole-stage-codegen compilation (5s+ for the wide
        # dedup DAGs); the measured runs report best + spread
        # (max-min), so every cross-round delta carries its own error
        # bar.  Round-5 verdict "What's wrong" #1: single-shot numbers
        # drifted 2.2x on untouched code between rounds, and the
        # resulting ghost-chasing cost a round — the spread makes
        # machine drift visible inside one artifact.
        #
        # Per-query isolation: a broken query reports "failed" and the
        # rest of the bench still runs and emits numbers.
        try:
            n = 0
            samples: list[float] = []
            for i in range(4):
                t0 = time.time()
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.time() - t0
                if i > 0:
                    samples.append(dt)
            best = min(samples)
            spread = max(samples) - best
            timings[name] = {"best": round(best, 3), "spread": round(spread, 3)}
            total += best
            print(
                f"# {name}: best={best:.2f}s spread={spread:.2f}s rows={n}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 — bench must survive any query
            timings[name] = "failed"
            failed.append(name)
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)

    try:
        extra = bench_extra(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        extra = {"bench_extra": "failed"}
        print(f"# bench_extra: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
    timings.update(extra)

    # A partial sum would under-report (look *better*) when a slow query
    # crashed, so a run with failures emits value=null + valid=false and
    # cross-round consumers can't mis-rank it (ADVICE r4).
    result = {
        "metric": "headline_total",
        "value": None if failed else round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        result["failed"] = failed
        result["valid"] = False
    print(json.dumps(result))


def bench_extra(spark, sf_dir) -> dict[str, float]:
    """Non-SQL benchmarks (transactional tx/s etc.) — filled in as the
    engine layers land. Also times one representative per round-5
    operator family (retrieval / graph / clustering / decontamination)
    WITHOUT adding them to headline_total, so cross-round totals stay
    comparable while the new families still get measured."""
    out: dict[str, object] = {}

    from t_spoon_spark.registry import all_queries

    qs = all_queries()
    for name in (
        "text_bm25_search",
        "graph_pagerank_nations",
        "clustering_kmeans_fixed",
        "decontamination_ngram_overlap",
        "text_lm_bigram_score",
        "skyline_orders_pareto",
        "packing_greedy_whole_doc",
    ):
        if name not in qs:
            continue
        try:
            samples: list[float] = []
            for i in range(3):  # 1 warmup + 2 measured, same error-bar
                t0 = time.time()  # convention as the headline set
                qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                if i > 0:
                    samples.append(dt)
            best = min(samples)
            out[f"x_{name}_sec"] = {
                "best": round(best, 3),
                "spread": round(max(samples) - best, 3),
            }
            print(f"# x_{name}: best={best:.2f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — per-metric isolation
            out[f"x_{name}_sec"] = "failed"
            print(f"# x_{name}: FAILED {exc}", file=sys.stderr)
    try:
        from t_spoon_spark.bench_txn import (
            bank_transfer_tps,
            bank_transfer_tps_fold,
            bank_transfer_tps_pl4,
            bank_transfer_tps_pl4_contended,
            sustainable_tps,
            txn_latency_ms_at_rate,
            txn_latency_ms_unloaded,
        )
    except ImportError:
        return out

    def _run(name: str, fn) -> None:
        try:
            out[name] = fn()
        except Exception as exc:  # noqa: BLE001 — per-metric isolation
            out[name] = "failed"
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)

    _run("txn_bank_tps_pl3", lambda: bank_transfer_tps(spark, sf_dir))
    _run("txn_bank_tps_fold", lambda: bank_transfer_tps_fold(spark, sf_dir))
    # reference PL4 comparables: 1,000 tx/s (series/pessimistic) and
    # 500 tx/s (1k-key contended) — start_rates.properties.example:5-6
    _run("txn_bank_tps_pl4", lambda: bank_transfer_tps_pl4(spark, sf_dir))
    _run(
        "txn_bank_tps_pl4_contended",
        lambda: bank_transfer_tps_pl4_contended(spark, sf_dir),
    )

    # BASELINE.md engine gate: >= 2,500 tx/s measured with a
    # rate-targeting loop (TunableSource semantics), not a fixed
    # workload — plus end-to-end commit latency AT that rate (the
    # reference's latency-at-sustained-rate metric).
    def _sustained() -> None:
        curve: list = []
        try:
            rate, latency_ms = sustainable_tps(
                spark, sf_dir, measure_latency=True, curve=curve
            )
            out["sustainable_tps_pl3"] = rate
            out["txn_latency_ms_at_sustained_pl3"] = latency_ms
            # the full probe trace (reference: `targeting-curve`
            # accumulator, evaluation/TunableSource.java:29-33) — makes
            # the sustained-rate claim auditable from the bench artifact
            out["sustainable_tps_pl3_curve"] = curve
            # latency backed off to 0.8x sustained: at the saturation
            # edge the wall equals its budget by construction
            # (queueing); 20% under it measures service time — the
            # deployment operating point (round-5 verdict item 4)
            out["txn_latency_ms_at_80pct_sustained"] = txn_latency_ms_at_rate(
                spark, sf_dir, 0.8 * rate
            )
        except Exception as exc:  # noqa: BLE001
            out["sustainable_tps_pl3"] = "failed"
            if curve:
                out["sustainable_tps_pl3_curve"] = curve
            print(f"# sustainable_tps_pl3: FAILED {exc}", file=sys.stderr)

    _sustained()
    # the reference's latency-unloaded accumulator: commit latency
    # of a small epoch on an idle engine (the micro-batch floor)
    _run("txn_latency_ms_unloaded", lambda: txn_latency_ms_unloaded(spark, sf_dir))
    return out


if __name__ == "__main__":
    main()
