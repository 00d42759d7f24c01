"""User-defined aggregate / table function surface (SURVEY §2.9: the
reference's "UDF surface" is arbitrary Java in StateFunction /
TWindowFunction; the Spark-native equivalents are Arrow-batched
grouped aggregates (applyInPandas) and Python UDTFs).

These entries deliberately route through the Python UDx machinery
— the one place the engine allows Python in a data plane — to gate
that machinery itself: the pandas grouped aggregate (applyInPandas),
the Python UDTF, and Spark 4's pyarrow-native grouped map
(applyInArrow). All are Arrow-batched, never row-at-a-time pickling;
the docstrings carry the scale contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register


@register(
    "udaf_gini_by_type",
    """
    WITH vals AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(FLOOR(value * 100 + 0.5) AS BIGINT), event_id) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (PARTITION BY event_type) AS s
      FROM events
    )
    SELECT event_type,
           MAX(n) AS n,
           CAST(FLOOR(SUM((2 * i - n - 1) * v) * 1000000.0 / (MAX(n) * MAX(s))) AS BIGINT)
             AS gini_ppm
    FROM vals
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def udaf_gini_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (Gini concentration of event values per type)
    through the Arrow grouped-aggregate path: applyInPandas receives
    each group as a pandas frame and computes the sorted-rank Gini sum
    vectorized in numpy — the engine's UDAF story for aggregates Spark
    lacks. One shuffle on the group key; each group crosses the Arrow
    boundary once (no per-row Python). Values are fixed-point ints and
    ties break on event_id, so the DuckDB window-recompute twin is
    bit-exact. At 100 TB a skewed group is the caveat (a group must fit
    one executor's Arrow batch stream) — for heavy keys, pre-aggregate
    or sketch instead."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )

    def gini(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["v", "event_id"]).reset_index(drop=True)
        v = pdf["v"].to_numpy(dtype=np.int64)
        n = len(v)
        s = int(v.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * v).sum())
        gini_ppm = int(np.floor(num * 1_000_000.0 / (n * s))) if s else 0
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "n": [n], "gini_ppm": [gini_ppm]}
        )

    out = ev.groupBy("event_type").applyInPandas(
        gini, "event_type string, n bigint, gini_ppm bigint"
    )
    return out.orderBy("event_type")


@register(
    "udtf_ngram_explode",
    """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS pos,
           toks[i] || ' ' || toks[i+1] AS bigram
    FROM tok, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS g(i)
    ORDER BY doc_id, pos
    """,
)
def udtf_ngram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 @udtf, Arrow-batched): one input row ->
    many output rows, here a bigram expander over the first 50 docs.
    This gates the table-function surface itself; for THIS particular
    expansion the pure-column equivalent (transform+posexplode, used by
    the dedup/text operators) is the production path — a real UDTF
    earns its place when the expansion logic needs a Python library
    (tokenizers, parsers). Restricted input set keeps the Python-side
    work gate-sized."""
    from pyspark.sql.functions import udtf

    # useArrow: without it Spark plans BatchEvalPythonUDTF (row-at-a-time
    # pickling); with it the exchange is Arrow-batched like every other
    # Python crossing in the engine (corpus-wide gate in test_plan_sweep)
    @udtf(returnType="doc_id bigint, pos bigint, bigram string", useArrow=True)
    class BigramUdtf:
        def eval(self, doc_id, text):
            toks = [w for w in (text or "").split() if w]
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i] + " " + toks[i + 1]

    docs = (
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select("doc_id", "text")
    )
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("tspoon_bigrams", BigramUdtf)
    out = spark.sql(
        "SELECT b.* FROM udtf_docs_in, LATERAL tspoon_bigrams(doc_id, text) b"
    )
    return out.orderBy("doc_id", "pos")


@register(
    "udaf_arrow_native_entropy",
    """
    WITH binned AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(FLOOR(value / 64.0) AS BIGINT), 0), 7) AS bin
      FROM events
    ),
    counts AS (
      SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY event_type, bin
    ),
    tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY event_type)
    SELECT c.event_type,
           CAST(MAX(t.n) AS BIGINT) AS n,
           CAST(SUM(c.c * CAST(FLOOR(ln(CAST(t.n AS DOUBLE) / c.c) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) // CAST(MAX(t.n) AS BIGINT)
             AS entropy_c
    FROM counts c JOIN tot t USING (event_type)
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
)
def udaf_arrow_native_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Shannon entropy of the value distribution (8 equi-width
    bins) computed through Spark 4's ARROW-NATIVE grouped-map API
    (`applyInArrow` — pyarrow RecordBatches in and out, no pandas
    conversion), gating the third and newest Python UDx surface next to
    applyInPandas (udaf_gini) and the UDTF entry. Inside the UDF the
    math is plain integer Python over the 8-bin histogram: per-bin
    ln terms rounded once at 1e6 (the idf discipline), integer-summed,
    so the Arrow path's result is bit-identical to the SQL oracle. At
    scale each group crosses into Python once as Arrow batches — same
    contract as the pandas UDAF."""
    import pyarrow as pa

    ev = t(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(
            F.greatest(F.floor(F.col("value") / 64.0).cast("long"), F.lit(0)),
            F.lit(7),
        ).alias("bin"),
    )

    def entropy(table: "pa.Table") -> "pa.Table":
        import math
        from collections import Counter

        counts = Counter(table.column("bin").to_pylist())
        etype = table.column("event_type")[0].as_py() if table.num_rows else None
        n = sum(counts.values())
        acc = 0
        for c in counts.values():
            acc += c * int(math.floor(math.log(float(n) / c) * 1e6 + 0.5))
        return pa.Table.from_pydict(
            {
                "event_type": [etype],
                "n": [n],
                "entropy_c": [acc // n if n else 0],
            },
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("entropy_c", pa.int64()),
                ]
            ),
        )

    out = binned.groupBy("event_type").applyInArrow(
        entropy, schema="event_type string, n bigint, entropy_c bigint"
    )
    return out.orderBy("event_type")
