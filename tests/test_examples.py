"""The examples/ programs (the reference's evaluation entry points:
BankUseCase + ConsistencyCheck, QueryEvaluation) must run green on the
shared session — they are living documentation, so they are tested."""

from __future__ import annotations


def test_bank_use_case_example(spark):
    from examples.bank_use_case import main

    out = main(spark)
    assert out["votes"].get("COMMIT", 0) > 0
    assert out["total"] == out["expected_total"]
    assert out["min_balance"] >= 0.0


def test_query_service_example(spark):
    from examples.query_service import main

    out = main(spark)
    assert len(out["answers"]) == 6
    assert out["final_watermark"] >= 1


def test_curate_corpus_example(spark):
    from examples.curate_corpus import main

    out = main(spark)
    assert 0 < out["n_kept"] < out["n_raw"]
    assert set(out["splits"]) <= {"train", "val", "test"}
    # n_kept is counted BEFORE the split assignment, so this pins that
    # the split manifest exactly partitions the kept set (no doc
    # dropped or double-counted by the bucket assignment)
    assert sum(n for n, _ in out["splits"].values()) == out["n_kept"]
    # the quality gate + near-dup drop must actually bite on the
    # synthetic corpus (it contains failing docs and clusters)
    assert out["n_kept"] <= out["n_raw"] * 0.9


def test_pack_corpus_example(spark):
    from examples.pack_corpus import main

    out = main(spark)
    assert out["n_dropped_semantic"] > 0
    assert out["n_packed_docs"] + out["n_dropped_semantic"] <= out["n_raw"]
    assert out["n_bins"] > 0 and out["padding_waste"] >= 0
    # every bin except possibly the last per source is within budget by
    # construction; waste is bounded by bins * budget
    assert out["n_tokens"] + out["padding_waste"] == out["n_bins"] * 512


def test_durable_bank_example(spark):
    from examples.durable_bank import MAX_EPOCHS, N_EPOCHS, main

    out = main(spark)
    assert out["votes"].get("COMMIT", 0) > 0
    assert out["total"] == out["expected_total"]
    assert out["min_balance"] >= 0.0
    assert out["watermark"] == N_EPOCHS - 1
    assert out["rows_at_horizon"] > 0
    assert out["below_horizon"].startswith("refused"), out["below_horizon"]
    assert MAX_EPOCHS < N_EPOCHS  # the refusal branch is actually exercised
