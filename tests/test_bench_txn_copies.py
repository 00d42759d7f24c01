"""The amplified transfer stream (`_transfers(copies=N)`) must be a
deterministic interleaving of the base workload: dense renumbered tids,
accounts/amounts a pure function of tid, and sizing that never explodes
at small scale factors (the sf0.001 regression: a reserve-1000 guard
drove the copies estimate to `needed` itself — 600k copies — and the
fixed-rate latency pins hung in plan construction)."""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.bench_txn import _transfers

SF = "/root/testdata/sf0.001"


def test_copies_replicates_deterministically(spark):
    base = _transfers(spark, SF).orderBy("_tid").toPandas()
    amp = _transfers(spark, SF, copies=3).orderBy("_tid").toPandas()
    assert len(amp) == 3 * len(base)
    # dense tid range: every replica slot filled exactly once
    assert sorted(amp["_tid"]) == list(range(int(amp["_tid"].max()) + 1)) or (
        set(amp["_tid"]) == {e * 3 + c for e in base["_tid"] for c in range(3)}
    )
    # replica c=0 of event e carries tid e*3 — same account-hash formula
    # as any other tid, so spot-check the derivation agrees with a
    # straight recomputation
    row = amp[amp["_tid"] == int(base["_tid"].iloc[5]) * 3].iloc[0]
    mix = 2654435761
    h = (int(row["_tid"]) * mix) % (100_000 * 7919)
    assert row["from_account"] == f"a{h % 100_000}"


def test_latency_pin_copies_bounded_at_tiny_sf():
    """The copies estimate for a fixed-rate pin must scale as
    needed/base — never degrade to `needed` itself when the base is at
    or under the 1k-row warm reserve (the sf0.001 hang)."""
    from t_spoon_spark.bench_txn import _pin_copies

    for base in (1000, 999, 500, 1, 1300, 130_000):
        # n_epochs measured + TWO full-size warm epochs (round-9
        # settling methodology)
        needed = int(30000 * 5.0) * 5
        copies = _pin_copies(base, 30000.0, 5.0, 3)
        assert copies * base >= needed or base < 2  # always enough stream
        assert copies <= 4 * (needed // base + 1)  # never the explosion
    # the regression pinpointed: base_total exactly 1000
    assert _pin_copies(1000, 30000.0, 5.0, 3) <= 1600


def test_free_checkpoint_drops_blocks(spark):
    """ADVICE r12: the widening loop must free a superseded
    eagerly-localCheckpointed stream's storage blocks instead of holding
    every generation until GC."""
    from t_spoon_spark.bench_txn import _free_checkpoint

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.range(10_000).localCheckpoint(eager=True)
    assert jsc.getPersistentRDDs().size() == before + 1
    _free_checkpoint(df)
    assert jsc.getPersistentRDDs().size() == before


def test_prev_discovered_rate_reads_newest_artifact(tmp_path, monkeypatch):
    """The probe seed comes from the NEWEST BENCH artifact carrying a
    numeric sustainable_tps_pl3 (driver artifacts nest the contract line
    under 'parsed'); failures/absence degrade to None (cold probe)."""
    import json as _json

    import bench

    monkeypatch.setattr(bench, "REPO", tmp_path)
    assert bench._prev_discovered_rate() is None
    (tmp_path / "BENCH_r01.json").write_text(
        _json.dumps({"parsed": {"queries": {"sustainable_tps_pl3": 52000.0}}})
    )
    assert bench._prev_discovered_rate() == 52000.0
    # newest artifact wins; "failed" strings are skipped to the next
    (tmp_path / "BENCH_r02.json").write_text(
        _json.dumps({"parsed": {"queries": {"sustainable_tps_pl3": 110500.0}}})
    )
    (tmp_path / "BENCH_r03.json").write_text(
        _json.dumps({"parsed": {"queries": {"sustainable_tps_pl3": "failed"}}})
    )
    assert bench._prev_discovered_rate() == 110500.0
    # unparseable newest artifact falls through to the next readable one
    (tmp_path / "BENCH_r04.json").write_text("{not json")
    assert bench._prev_discovered_rate() == 110500.0
    # numeric round order: r100 must outrank r99 (lexicographic sort
    # would pick r99 forever once rounds reach three digits)
    (tmp_path / "BENCH_r99.json").write_text(
        _json.dumps({"parsed": {"queries": {"sustainable_tps_pl3": 1.0}}})
    )
    (tmp_path / "BENCH_r100.json").write_text(
        _json.dumps({"parsed": {"queries": {"sustainable_tps_pl3": 2.0}}})
    )
    assert bench._prev_discovered_rate() == 2.0
