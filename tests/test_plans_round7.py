"""Plan-shape and invariant gates for the round-7 additions: duplicate
n-gram spans, BFS hop frontier, hard-negative mining, and k-center
coreset selection.  Value parity is pinned by the DuckDB oracles; these
tests pin the SCALE claims each docstring makes — partial aggregation
before the gram exchange, frontier-bounded per-round joins, a broadcast
(never cartesian) query side, and a shuffle-free per-round distance
update.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.plans.explain import count_shuffles, executed_plan, has_broadcast_join
from tests.conftest import SF_SMALL


def test_ngram_spans_partial_agg_before_exchange(spark):
    from t_spoon_spark.queries.text import text_duplicate_ngram_spans

    df = text_duplicate_ngram_spans(spark, SF_SMALL)
    plan = executed_plan(df)
    # the gram aggregate must combine map-side before the one corpus
    # exchange; the explode stays JVM-side (no Python crossing)
    assert "partial" in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ngram_spans_greedy_invariants(spark):
    from t_spoon_spark.queries.text import text_duplicate_ngram_spans

    rows = text_duplicate_ngram_spans(spark, SF_SMALL).collect()
    assert rows, "duplicate spans must exist in the synthetic corpus"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_occ >= r.n_docs
        assert len(r.gram.split(" ")) == 8
    # ranked by (n_docs desc, n_occ desc, gram)
    keys = [(-r.n_docs, -r.n_occ, r.gram) for r in rows]
    assert keys == sorted(keys)


def test_bfs_round_plan_frontier_bounded(spark):
    """One BFS round — frontier join edges + visited anti-join — must
    be equi-join shaped (no cartesian, no Python) and the visited-set
    subtraction must plan as a real anti-join."""
    from t_spoon_spark.queries.graph import graph_bfs_hop_frontier

    df = graph_bfs_hop_frontier(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    rows = {r.hop: (r.n_parts, r.parts_ck) for r in df.collect()}
    # hop 0 = the seed set; every later hop non-empty until exhaustion
    assert 0 in rows
    hops = sorted(rows)
    assert hops == list(range(len(hops))), f"gapped hop histogram: {hops}"


def test_hard_negatives_broadcasts_queries(spark):
    from t_spoon_spark.queries.similarity2 import HN_K, similarity_hard_negatives

    df = similarity_hard_negatives(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert has_broadcast_join(df) or "BroadcastNestedLoopJoin" in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.q_label != r.neg_label  # the defining constraint
        assert 1 <= r.rnk <= HN_K


def test_kcenter_round_update_is_map_only(spark):
    """The per-round min-distance update (least(md, dist-to-new-center))
    reads the checkpointed frame and writes a projection — zero
    exchanges, which is what makes k rounds affordable at corpus
    scale."""
    from t_spoon_spark.operators.similarity import int_embedding
    from t_spoon_spark.queries.relational import t

    base = (
        t(spark, SF_SMALL, "embeddings")
        .select("vec_id", int_embedding("embedding").alias("ei"))
        .localCheckpoint(eager=True)
    )
    center = base.filter(F.col("vec_id") == 0).select("ei").collect()[0]["ei"]
    lit = F.array(*[F.lit(int(v)).cast("long") for v in center])
    nd = F.aggregate(
        F.zip_with(F.col("ei"), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    md = base.select("vec_id", "ei", nd.alias("md"))
    update = md.select("vec_id", "ei", F.least(F.col("md"), nd).alias("md"))
    assert count_shuffles(update) == 0, executed_plan(update)


def test_kcenter_greedy_radius_monotone(spark):
    """Gonzalez greedy invariant: the distance of each newly selected
    center to the prior set is non-increasing, and all selected ids are
    distinct with the seed first."""
    from t_spoon_spark.queries.sampling import KC_K, sample_kcenter_coreset

    rows = sample_kcenter_coreset(spark, SF_SMALL).collect()
    assert len(rows) == KC_K
    assert rows[0].vec_id == 0 and rows[0].mind2 == 0
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == KC_K
    dists = [r.mind2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists


def test_prefix_filter_complete_vs_uncapped_ground_truth(spark):
    """The PPJoin claim: prefix-filter candidates lose NOTHING at the
    threshold. Ground truth = exact Jaccard over ALL pairs sharing any
    shingle (complete for tau > 0, no df cap, no prefix)."""
    from t_spoon_spark.operators.dedup import doc_shingle_hashes
    from t_spoon_spark.queries.dedup2 import PF_TAU, dedup_prefix_filter_jaccard
    from t_spoon_spark.queries.relational import t

    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_c)
        for r in dedup_prefix_filter_jaccard(spark, SF_SMALL).collect()
    }

    sh = doc_shingle_hashes(t(spark, SF_SMALL, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh_hash")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh_hash")
    inter = (
        a.join(b, "sh_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    truth = {}
    for r in inter.join(za, "doc_a").join(zb, "doc_b").collect():
        jac = (r.n_inter * 100) // (r.sz_a + r.sz_b - r.n_inter)
        if jac >= PF_TAU:
            truth[(r.doc_a, r.doc_b)] = (r.n_inter, jac)
    assert got == truth, (len(got), len(truth))


def test_prefix_filter_plan_no_cartesian_partial_agg(spark):
    from t_spoon_spark.queries.dedup2 import dedup_prefix_filter_jaccard

    df = dedup_prefix_filter_jaccard(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_binary_hamming_two_stage(spark):
    """Binary-quantization ANN: stage 1 must stay broadcast-shaped (no
    cartesian, no Python), and the output must be the exact-cosine
    re-rank of a Hamming pool — rnk dense per query, scores sorted with
    the c_id tiebreak, ham within the 64-bit signature range."""
    from t_spoon_spark.queries.similarity2 import N_Q, similarity_binary_hamming_topk

    df = similarity_binary_hamming_topk(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or has_broadcast_join(df), plan
    rows = df.collect()
    assert len(rows) == 5 * N_Q
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.ham <= 64
        by_q.setdefault(r.q_id, []).append(r)
    for rs in by_q.values():
        assert [r.rnk for r in rs] == [1, 2, 3, 4, 5]
        keys = [(-r.cos_c, r.c_id) for r in rs]
        assert keys == sorted(keys)


def test_binary_hamming_signature_bit_layout(spark):
    """Pin the packed-word bit layout against a locally recomputed
    signature for one vector: bit (i mod 32) of word (i div 32) is set
    iff fixed-point dimension i is positive."""
    from t_spoon_spark.operators.similarity import int_embedding
    from t_spoon_spark.queries.relational import t
    from t_spoon_spark.queries.similarity2 import similarity_binary_hamming_topk  # noqa: F401

    row = (
        t(spark, SF_SMALL, "embeddings")
        .filter(F.col("vec_id") == 7)
        .select(int_embedding("embedding").alias("ei"))
        .collect()[0]
    )
    w0 = sum(1 << i for i, v in enumerate(row.ei[:32]) if v > 0)
    w1 = sum(1 << i for i, v in enumerate(row.ei[32:64]) if v > 0)
    import duckdb

    got = duckdb.sql(
        "SELECT list_sum(list_transform(range(1, 33), i -> CASE WHEN ei[i] > 0 "
        "THEN CAST(1 AS BIGINT) << (i - 1) ELSE CAST(0 AS BIGINT) END)) AS w0, "
        "list_sum(list_transform(range(33, 65), i -> CASE WHEN ei[i] > 0 "
        "THEN CAST(1 AS BIGINT) << (i - 33) ELSE CAST(0 AS BIGINT) END)) AS w1 "
        "FROM (SELECT ? AS ei)",
        params=[list(row.ei)],
    ).fetchone()
    assert (w0, w1) == got


def test_containment_complete_vs_uncapped_ground_truth(spark):
    """Asymmetric prefix filtering loses nothing: ground truth = exact
    containment over ALL ordered pairs sharing any shingle."""
    from t_spoon_spark.operators.dedup import doc_shingle_hashes
    from t_spoon_spark.queries.dedup2 import CT_TAU, dedup_containment_join
    from t_spoon_spark.queries.relational import t

    got = {
        (r.doc_in, r.doc_out): (r.n_inter, r.containment_c)
        for r in dedup_containment_join(spark, SF_SMALL).collect()
    }

    sh = doc_shingle_hashes(t(spark, SF_SMALL, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_in"), "sh_hash")
    b = sh.select(F.col("doc_id").alias("doc_out"), "sh_hash")
    inter = (
        a.join(b, "sh_hash")
        .filter(F.col("doc_in") != F.col("doc_out"))
        .groupBy("doc_in", "doc_out")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_in"), F.col("sz").alias("sz_in"))
    truth = {}
    for r in inter.join(za, "doc_in").collect():
        c = (r.n_inter * 100) // r.sz_in
        if c >= CT_TAU:
            truth[(r.doc_in, r.doc_out)] = (r.n_inter, c)
    assert got == truth, (len(got), len(truth))
    # the measure must be genuinely directional on this corpus: at
    # least one pair scores differently in the two directions (the
    # smaller doc is more contained than the larger one)
    assert any(
        (b_, a_) in got and got[(a_, b_)][1] != got[(b_, a_)][1]
        for (a_, b_) in got
    ), got


def test_containment_plan_no_cartesian_partial_agg(spark):
    from t_spoon_spark.queries.dedup2 import dedup_containment_join

    df = dedup_containment_join(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_bpe_learn_merges_invariants(spark):
    """BPE greedy invariants: steps dense from 1, symbols non-empty,
    and the argmax pair count is monotone non-increasing (a merge only
    removes occurrences of existing pairs; pairs it creates are bounded
    by the merged pair's own count)."""
    from t_spoon_spark.queries.text import BPE_ROUNDS, text_bpe_learn_merges

    rows = text_bpe_learn_merges(spark, SF_SMALL).collect()
    assert [r.step for r in rows] == list(range(1, BPE_ROUNDS + 1))
    assert all(r.lhs and r.rhs and r.pair_n > 0 for r in rows)
    counts = [r.pair_n for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    # later rounds may merge previously-merged symbols (multi-char lhs
    # or rhs) — make sure nothing about the loop forbids that; at least
    # the table must contain only [a-z]+ symbols
    assert all(r.lhs.isalpha() and r.rhs.isalpha() for r in rows)


def test_bpe_learn_round_plan_shape(spark):
    """One learning round: the pair count must partial-aggregate before
    its single exchange and the argmax must plan as a top-1
    (TakeOrderedAndProject), never a global sort; the whole round stays
    JVM-side."""
    from t_spoon_spark.queries.relational import t as t_

    seg0 = (
        t_(spark, SF_SMALL, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select("word", "freq", F.regexp_replace("word", "(.)", r"|$1|").alias("seg"))
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    pairs = (
        seg0.select(
            "freq", F.split(F.expr("trim(BOTH '|' FROM seg)"), r"\|\|").alias("syms")
        )
        .filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs))"
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
        .limit(1)
    )
    plan = executed_plan(pairs)
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "BatchEvalPython" not in plan, plan


def test_ann_recall_report_arithmetic(spark):
    """The recall report's arithmetic and coverage: every method
    present exactly once, hits bounded by the ground-truth size, the
    percentage derived from the hit count, exact-re-rank methods
    scoring at least as well as their own candidate stage allows."""
    from t_spoon_spark.queries.similarity2 import (
        _ANN_METHODS,
        similarity_ann_recall_report,
    )

    rows = similarity_ann_recall_report(spark, SF_SMALL).collect()
    assert [r.method for r in rows] == sorted(t for t, _ in _ANN_METHODS)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_total
        assert r.recall_pct == (r.n_hits * 100) // r.n_total


def test_lsh_multiprobe_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of single-probe (the self
    bucket is probed too), and under the shared (cos desc, c_id) total
    order a superset pool's exact-re-ranked top-5 can only swap a
    ground-truth hit for another hit — so recall is provably
    non-decreasing.  Plan must stay cartesian-free and JVM-side."""
    from t_spoon_spark.queries.similarity import similarity_lsh_multiprobe_topk
    from t_spoon_spark.queries.similarity2 import similarity_ann_recall_report

    df = similarity_lsh_multiprobe_topk(spark, SF_SMALL)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    rep = {r.method: r.n_hits for r in similarity_ann_recall_report(spark, SF_SMALL).collect()}
    assert rep["lsh_mp"] >= rep["lsh"], rep


def test_streaming_full_outer_has_all_three_row_classes(spark):
    """The full-outer drain must produce matched rows AND both
    null-padded tails (never-converted clicks, un-preceded purchases) —
    and no sentinel may survive the post-drain filter."""
    from t_spoon_spark.queries.streaming_native import (
        streaming_interval_join_full_outer,
    )

    rows = streaming_interval_join_full_outer(spark, SF_SMALL).collect()
    assert rows
    matched = [r for r in rows if r.click_id is not None and r.purchase_id is not None]
    click_only = [r for r in rows if r.purchase_id is None]
    purchase_only = [r for r in rows if r.click_id is None]
    assert matched and click_only and purchase_only, (
        len(matched), len(click_only), len(purchase_only),
    )
    assert all((r.click_id or 0) >= 0 and (r.purchase_id or 0) >= 0 for r in rows)


def test_bucketed_entry_join_is_exchange_free(spark):
    """The driver-gated bucketed entry's value contract is the oracle's
    job; THIS pins its scale contract — after the entry's write, a join
    of the two bucketed tables on the bucket key plans as a
    SortMergeJoin with zero Exchange on either side."""
    from t_spoon_spark.operators.skew import bucketed
    from t_spoon_spark.queries.io_formats import io_bucketed_colocated_join

    io_bucketed_colocated_join(spark, SF_SMALL).collect()
    j = (
        bucketed(spark, "tspoon_b_orders")
        .hint("merge")
        .join(bucketed(spark, "tspoon_b_customer"), "o_custkey")
    )
    plan = executed_plan(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
