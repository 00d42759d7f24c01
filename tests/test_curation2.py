"""Edge-case gates for the round-13 curation operators, beyond the
parametrized sf0.001 oracle in test_relational.py: a synthetic corpus
exercising the boundaries the real testdata doesn't — single-doc
sources (quantile rank collapses to 1), uniform lengths (P25 == P75),
empty documents (zero tokens), and (source, lang) cells exactly at the
sampling cap — each checked exact-hash against the SAME DuckDB oracle
SQL the driver runs.
"""

from __future__ import annotations

import duckdb
import pytest

from t_spoon_spark.testing import compare_frames


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rows = []
    # source s1: one doc (rank arithmetic must collapse to the value)
    rows.append((1, "alpha beta gamma", "en", "s1"))
    # source s2: uniform lengths (P25 == P75 keeps everything)
    for i in range(4):
        rows.append((10 + i, "tok " * 5, "en", "s2"))
    # source s3: spread lengths incl. an empty doc (0 tokens)
    rows.append((20, "", "en", "s3"))
    rows.append((21, "a", "en", "s3"))
    rows.append((22, "a b c d", "en", "s3"))
    rows.append((23, "a b c d e f g h", "en", "s3"))
    # source s4: two langs, one cell exactly at GROUP_CAP docs, one over
    from t_spoon_spark.queries.curation2 import GROUP_CAP

    for i in range(GROUP_CAP):
        rows.append((30 + i, f"x{i} y z", "de", "s4"))
    for i in range(GROUP_CAP + 2):
        rows.append((40 + i, f"p{i} q", "fr", "s4"))
    d = tmp_path_factory.mktemp("curation2") / "corpus"
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_corpus(corpus_dir):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB wants the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "name",
    [
        "curation_length_quantile_band",
        "curation_mix_rebalance_plan",
        "sample_group_capped",
        "dedup_prefix_hash_groups",
    ],
)
def test_edge_corpus_matches_oracle(spark, corpus_dir, duck_corpus, name):
    from t_spoon_spark.registry import all_oracles, all_queries

    spark_pdf = all_queries()[name](spark, corpus_dir).toPandas()
    duck_pdf = duck_corpus.execute(all_oracles()[name]).df()
    errs = compare_frames(spark_pdf, duck_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_quantile_band_boundaries(spark, corpus_dir):
    from t_spoon_spark.queries.curation2 import curation_length_quantile_band

    out = {
        r["source"]: r.asDict()
        for r in curation_length_quantile_band(spark, corpus_dir).collect()
    }
    # single doc: both quantiles are the doc's own length, kept = 1
    assert out["s1"]["p25_tok"] == out["s1"]["p75_tok"] == 3
    assert out["s1"]["kept_docs"] == 1
    # uniform lengths: band keeps everything
    assert out["s2"]["p25_tok"] == out["s2"]["p75_tok"] == 5
    assert out["s2"]["kept_docs"] == out["s2"]["n_docs"] == 4
    # spread with an empty doc: n=4 -> p25 rank=(4+3)//4=1 (the empty
    # doc, 0 tokens), p75 rank=(12+3)//4=3 (the 4-token doc)
    assert out["s3"]["p25_tok"] == 0 and out["s3"]["p75_tok"] == 4
    assert out["s3"]["kept_docs"] == 3  # the 8-token tail drops


def test_group_cap_boundary(spark, corpus_dir):
    from t_spoon_spark.queries.curation2 import GROUP_CAP, sample_group_capped

    out = sample_group_capped(spark, corpus_dir).toPandas()
    per_cell = out.groupby(["source", "lang"]).size().to_dict()
    # the exactly-at-cap cell keeps all; the over-cap cell truncates
    assert per_cell[("s4", "de")] == GROUP_CAP
    assert per_cell[("s4", "fr")] == GROUP_CAP
    # under-cap cells keep everything
    assert per_cell[("s2", "en")] == min(GROUP_CAP, 4)
    assert per_cell[("s1", "en")] == 1


def test_leakage_safe_split_property(spark):
    """The whole point of the operator: near-dup cluster members NEVER
    straddle splits, singletons are their own cluster, and the doc-hash
    split (sample_train_val_test_split's scheme) would NOT have this
    property on the same corpus — i.e. the operator is doing work."""
    from tests.conftest import SF_SMALL
    from t_spoon_spark.queries.curation2 import sample_leakage_safe_split

    out = sample_leakage_safe_split(spark, SF_SMALL).toPandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    # every cluster maps to exactly one split
    per_cluster = out.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # clusters with >1 member exist at this SF (16 simhash groups), so
    # the property is exercised, not vacuous
    sizes = out.groupby("cluster_id").size()
    assert (sizes > 1).any()
    # and the naive doc-level hash would split at least one cluster
    # (recompute the doc-hash bucket the existing splitter uses)
    from t_spoon_spark.operators.text import md5_long
    from pyspark.sql import functions as F

    doc_bucket = (
        spark.createDataFrame(out[["doc_id", "cluster_id"]])
        .select("cluster_id", (md5_long(F.col("doc_id").cast("string")) % 10).alias("b"))
        .toPandas()
    )
    naive = doc_bucket.groupby("cluster_id")["b"].nunique()
    multi = set(sizes[sizes > 1].index)
    assert any(naive.get(c, 1) > 1 for c in multi), (
        "doc-level hash happened to agree everywhere — corpus too small to "
        "demonstrate the leakage the operator prevents"
    )


def test_partitioned_events_layout_is_per_sf(spark):
    """Review finding (r13): the partitioned-events scratch layout must
    be per sf_dir — a shared dir would let a later call overwrite the
    files under an earlier call's still-lazy frame."""
    from t_spoon_spark.queries.io_formats2 import partitioned_events

    small = partitioned_events(spark, "/root/testdata/sf0.001")
    bigger = partitioned_events(spark, "/root/testdata/sf0.01")
    n_small, n_big = small.count(), bigger.count()
    assert n_small < n_big
    # the earlier frame still reads ITS corpus after the later write
    assert small.count() == n_small
