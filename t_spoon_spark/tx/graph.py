"""Transactional graph (TGraph) declaration — the engine's equivalent of
the reference's TStream surface (tgraph/TStream.java:16-28,
tgraph/AbstractTStream.java:102-200).

A graph is a declarative pipeline of stages applied to each epoch's
batch. Metadata travels as columns (SURVEY.md §1.5):

    _tid   BIGINT      transaction id (assigned at open)
    _ts    BIGINT      logical timestamp (= _tid, as in single-graph
                       reference runs, tgraph/twopc/TransactionsIndex.java:93-106)
    _path  ARRAY<INT>  flatMap lineage (BatchID steps,
                       tgraph/BatchID.java:27-74 — posexplode's pos IS
                       the (offset) step; completeness is free in
                       micro-batch so sizes aren't tracked)
    _alive BOOLEAN     filter tombstone (tgraph/functions/FilterWrapper.java:9-16:
                       non-matching records become null-value tombstones
                       so the close still sees their vote)

Value columns are everything else; map/flatMap replace them, state
reads them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_COLS = ["_tid", "_ts", "_path", "_alive"]


@dataclass
class MapStage:
    fn: Callable[[DataFrame], dict[str, Column]]


@dataclass
class FlatMapStage:
    # fn(df) -> Column evaluating to ARRAY<STRUCT<...>>; each element
    # becomes a child record sharing the parent's tid (reference
    # tgraph/functions/FlatMapWrapper.java:14-31).
    fn: Callable[[DataFrame], Column]


@dataclass
class FilterStage:
    pred: Callable[[DataFrame], Column]


@dataclass
class KeyByStage:
    # explicit repartition hint (reference TStream.keyBy,
    # tgraph/AbstractTStream.java:148-158). Usually unnecessary: the
    # state stage shuffles on its own key anyway.
    key: Callable[[DataFrame], Column]


@dataclass
class TWindowStage:
    # per-transaction window (tgraph/functions/WindowWrapper.java:23-70):
    # collapse all live sibling records of one txn into one record.
    # fn(items_col) -> dict of new value columns, items_col is
    # ARRAY<STRUCT<value cols>> sorted by _path.
    fn: Callable[[Column], dict[str, Column]]


@dataclass
class StateStage:
    namespace: str
    key: Callable[[DataFrame], Column]
    update: Callable[[Column], Column] | None = None
    py_update: Callable[[Any, dict], Any] | None = None
    # optional pre-combiner when one txn can carry several ops for the
    # same key and the update is fold-able: {value_col: "sum"|...}
    pre_combine: dict[str, str] | None = None
    # associative invariant-free fast path: fold the WHOLE epoch's ops
    # per key into one combined application (requires pre_combine).
    # Semantically the PL0/PL1 chain outcome for commutative updates —
    # no conflicts, no replays, map-side partial aggregation; this is
    # the high-throughput mode for counter/sum workloads at scale.
    epoch_combine: bool = False


Stage = MapStage | FlatMapStage | FilterStage | KeyByStage | TWindowStage | StateStage


@dataclass
class TGraph:
    """Fluent builder; immutable stages list, reusable across epochs."""

    stages: list[Stage] = field(default_factory=list)

    def _add(self, s: Stage) -> "TGraph":
        return TGraph(self.stages + [s])

    def map(self, fn: Callable[[DataFrame], dict[str, Column]]) -> "TGraph":
        return self._add(MapStage(fn))

    def flat_map(self, fn: Callable[[DataFrame], Column]) -> "TGraph":
        return self._add(FlatMapStage(fn))

    def filter(self, pred: Callable[[DataFrame], Column]) -> "TGraph":
        return self._add(FilterStage(pred))

    def key_by(self, key: Callable[[DataFrame], Column]) -> "TGraph":
        return self._add(KeyByStage(key))

    def t_window(self, fn: Callable[[Column], dict[str, Column]]) -> "TGraph":
        return self._add(TWindowStage(fn))

    def state(
        self,
        namespace: str,
        key: Callable[[DataFrame], Column],
        update: Callable[[Column], Column] | None = None,
        py_update: Callable[[Any, dict], Any] | None = None,
        pre_combine: dict[str, str] | None = None,
        epoch_combine: bool = False,
    ) -> "TGraph":
        if update is None and py_update is None:
            raise ValueError("state(): update or py_update required")
        if epoch_combine and (update is None or not pre_combine):
            raise ValueError("state(epoch_combine=True) needs an expression update + pre_combine")
        return self._add(
            StateStage(namespace, key, update, py_update, pre_combine, epoch_combine)
        )


def value_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in META_COLS]


def flat_map_total(df: DataFrame, stage: FlatMapStage) -> bool:
    """True iff this flat_map provably emits >= 1 row per input row: its
    expression analyzes to a literal-arity ``CreateArray`` with >= 1
    elements (such an array is never null and never empty, so
    posexplode always yields rows).  Data-dependent arrays (split,
    sequence, a column reference) return False — conservative, since a
    runtime value could be empty.  Used by the close path to drop the
    separate tid-set branch when every transaction provably reaches a
    state stage (links cover tids)."""
    try:
        arr = stage.fn(df)
        analyzed = df.select(arr.alias("__fm"))._jdf.queryExecution().analyzed()
        expr = analyzed.expressions().apply(0)
        child = expr.child() if hasattr(expr, "child") else expr
        if child.getClass().getSimpleName() != "CreateArray":
            return False
        return child.children().size() >= 1
    except Exception:  # pragma: no cover - introspection unavailable
        return False


def links_cover_tids(graph: "TGraph", df: DataFrame) -> bool:
    """True iff every transaction of a batch provably produces at least
    one state link: all stages preserve rows (map/key_by/state; filter
    and t_window can drop a txn's last live record, flat_map only
    qualifies when provably total) and at least one state stage exists.
    The close can then derive the epoch tid set FROM the links instead
    of scanning the source a second time (fused-pull part-0 branch).
    Only stages BEFORE the first state stage matter: once a txn has a
    link, later drops can't remove it from the link set.  The frame is
    evolved stage-by-stage (analysis only, no jobs) so a flat_map after
    a map introspects against the columns it will actually see."""
    try:
        for stage in graph.stages:
            if isinstance(stage, StateStage):
                return True
            if isinstance(stage, MapStage):
                df = apply_map(df, stage)
            elif isinstance(stage, KeyByStage):
                continue
            elif isinstance(stage, FlatMapStage):
                if not flat_map_total(df, stage):
                    return False
                df = apply_flat_map(df, stage)
            else:
                # FilterStage / TWindowStage can drop transactions
                return False
    except Exception:  # pragma: no cover - stay conservative
        return False
    return False


def apply_map(df: DataFrame, stage: MapStage) -> DataFrame:
    cols = stage.fn(df)
    return df.select(*META_COLS, *[c.alias(n) for n, c in cols.items()])


def apply_flat_map(df: DataFrame, stage: FlatMapStage) -> DataFrame:
    arr = stage.fn(df)
    exploded = df.select(*META_COLS, F.posexplode(arr).alias("_pos", "_elem"))
    elem_fields = exploded.schema["_elem"].dataType.fieldNames()
    return exploded.select(
        "_tid",
        "_ts",
        F.concat(F.col("_path"), F.array(F.col("_pos"))).alias("_path"),
        "_alive",
        *[F.col(f"_elem.{f}").alias(f) for f in elem_fields],
    )


def apply_filter(df: DataFrame, stage: FilterStage) -> DataFrame:
    # tombstone, do not drop: the transaction's vote accounting at close
    # must still see the record (reference keeps value=null flowing).
    return df.withColumn("_alive", F.col("_alive") & F.coalesce(stage.pred(df), F.lit(False)))


def apply_key_by(df: DataFrame, stage: KeyByStage) -> DataFrame:
    return df.repartition(stage.key(df))


def apply_t_window(df: DataFrame, stage: TWindowStage) -> DataFrame:
    vals = value_columns(df)
    items = F.array_sort(
        F.collect_list(F.struct(F.col("_path").alias("__p"), *[F.col(c) for c in vals]))
    )
    grouped = df.filter(F.col("_alive")).groupBy("_tid").agg(
        F.min("_ts").alias("_ts"), items.alias("__items")
    )
    # strip the sort key so user fn sees clean value structs
    clean = F.transform(
        F.col("__items"),
        lambda s: F.struct(*[s[c].alias(c) for c in vals]),
    )
    grouped = grouped.withColumn("__items", clean)
    out_cols = stage.fn(F.col("__items"))
    return grouped.select(
        "_tid",
        "_ts",
        F.array().cast("array<int>").alias("_path"),  # BatchID reset (WindowWrapper.java:44)
        F.lit(True).alias("_alive"),
        *[c.alias(n) for n, c in out_cols.items()],
    )
