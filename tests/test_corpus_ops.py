"""Round-10 corpus_ops pins, beyond the parametrized oracle gate in
test_relational.py (which already covers all four new entries):

- the BPE-apply oracle's duplicated learner CTEs stay verbatim-equal
  to queries/text.py's generator (corpus_ops deliberately does not
  import text's private generator so it never has to edit text.py;
  this test is what makes the duplication safe);
- best-fit-decreasing never uses MORE bins than the greedy
  first-open-bin fold on the same shard (the reason the operator
  exists);
- SemDeDup's within-cluster pair generation never crosses clusters
  (the blocker property that bounds the candidate budget).
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_bpe_apply_oracle_pins_learner_ctes():
    from t_spoon_spark.queries import corpus_ops, text

    assert corpus_ops.BPE_ROUNDS == text.BPE_ROUNDS
    t_sql = text._dd_bpe_oracle(text.BPE_ROUNDS)
    a_sql = corpus_ops._dd_bpe_apply_sql()
    body = t_sql[len("WITH ") :]
    chunks = [c.strip() for c in body.split(",\n    ")]
    # the learner's final SELECT is glued to its last CTE chunk
    chunks[-1] = chunks[-1].split("\n    SELECT")[0].strip()
    for chunk in chunks:
        assert chunk in a_sql, f"learner CTE drifted out of the apply oracle: {chunk[:60]}..."


def test_bfd_uses_no_more_bins_than_greedy(spark):
    from t_spoon_spark.queries import corpus_ops, packing
    from t_spoon_spark.queries.corpus_ops import packing_best_fit_decreasing
    from t_spoon_spark.queries.packing import packing_greedy_whole_doc

    # the comparison below is only meaningful while both packers share
    # one budget (each module pins its own constant into its oracle SQL)
    assert corpus_ops.PACK_BUDGET == packing.PACK_BUDGET

    bfd = (
        packing_best_fit_decreasing(spark, SF_SMALL)
        .groupBy("source")
        .agg({"bin_id": "max"})
        .collect()
    )
    greedy = (
        packing_greedy_whole_doc(spark, SF_SMALL)
        .groupBy("source")
        .agg({"pack_id": "max"})
        .collect()
    )
    bfd_bins = {r["source"]: r["max(bin_id)"] + 1 for r in bfd}
    greedy_bins = {r["source"]: r["max(pack_id)"] + 1 for r in greedy}
    assert set(bfd_bins) == set(greedy_bins)
    for src, n in bfd_bins.items():
        assert n <= greedy_bins[src], f"{src}: BFD {n} bins > greedy {greedy_bins[src]}"


def test_semdedup_totals_consistent(spark):
    from t_spoon_spark.queries.corpus_ops import dedup_semdedup_clusters
    from t_spoon_spark.queries.relational import t

    out = dedup_semdedup_clusters(spark, SF_SMALL).collect()
    n_vec = t(spark, SF_SMALL, "embeddings").count()
    assert sum(r.n_members for r in out) == n_vec
    for r in out:
        assert r.n_kept + r.n_dups == r.n_members
        assert r.n_kept >= 1  # the lowest-id member of a cluster is never a dup


def test_dsir_weights_discriminate_on_crafted_distributions(spark):
    """DSIR's whole point: docs drawn from the target distribution must
    outscore equal-length docs from a different distribution. The sf
    corpora can't show this (their lang slices share one near-uniform
    vocabulary — see the entry docstring), so the kernel is pinned on
    crafted data: target docs are 'alpha'-heavy, raw docs 'beta'-heavy,
    all exactly 20 tokens so length cannot explain the ordering."""
    from t_spoon_spark.queries.corpus_ops import dsir_scores

    rows = []
    for i in range(30):  # target-like: alpha-dominated
        rows.append((i, "tgt", " ".join(["alpha"] * 16 + ["beta"] * 4)))
    for i in range(30, 60):  # raw-only: beta-dominated
        rows.append((i, "other", " ".join(["beta"] * 16 + ["alpha"] * 4)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    scored = dsir_scores(docs, "tgt").collect()
    assert len(scored) == 60
    assert all(r.n_tok == 20 for r in scored)
    tgt_min = min(r.w_c for r in scored if r.lang == "tgt")
    other_max = max(r.w_c for r in scored if r.lang == "other")
    assert tgt_min > other_max, (tgt_min, other_max)


def test_dsir_entry_ranking_monotone(spark):
    from t_spoon_spark.queries.corpus_ops import sampling_dsir_importance

    top = sampling_dsir_importance(spark, SF_SMALL).collect()
    assert len(top) == 100
    ws = [r.w_c for r in sorted(top, key=lambda r: r.rnk)]
    assert all(a >= b for a, b in zip(ws, ws[1:]))


def test_bfd_python_reference_matches_engine(spark):
    """The sf1 oracle alternative (tools/bfd_reference_check.py) must
    agree with the engine exactly at the small gate SF too: DuckDB
    token counts + a plain-Python BFD fold vs the Arrow applyInPandas
    fold — same frames, same values (round-10 verdict #7)."""
    from t_spoon_spark.queries.corpus_ops import packing_best_fit_decreasing
    from t_spoon_spark.testing import compare_frames
    from tools.bfd_reference_check import reference_frame

    eng = packing_best_fit_decreasing(spark, SF_SMALL).toPandas()
    ref = reference_frame(SF_SMALL)
    assert compare_frames(eng, ref) == []
