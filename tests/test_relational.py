"""Oracle-gated tests for the relational corpus at sf0.001 (fast).

Every registered query with a DuckDB oracle must match exactly —
same check the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _entries():
    from t_spoon_spark.registry import all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()
    return [(n, qs[n], oracles.get(n)) for n in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _entries(), ids=[e[0] for e in _entries()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    from t_spoon_spark.testing import compare_frames

    spark_pdf = fn(spark, SF_SMALL).toPandas()
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_pdf = duck.execute(sql).df()
    errs = compare_frames(spark_pdf, duck_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "count_order"}
