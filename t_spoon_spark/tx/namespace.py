"""Namespace registry — the engine's mirror of the reference's
StateFunction contract (tgraph/state/StateFunction.java:10-18:
defaultValue / copyValue / invariant / apply) plus the schema the
reference never needed to declare (SURVEY.md §1.3: Spark requires a
value StructType where Flink accepted any Java object).

Keys are always STRING (reference constraint tgraph/db/Shard.java:30-32).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column


@dataclass
class Namespace:
    """A keyed state table.

    value_type: Spark DDL type of the value ("double", "int",
        "array<string>", ...).
    default: the value a key holds before its first write
        (StateFunction.defaultValue()).
    invariant: SQL boolean expression over `value` evaluated on the
        candidate post-update value; False => the whole transaction
        votes ABORT (StateFunction.invariant + ObjectHandler.applyInvariant,
        tgraph/db/ObjectHandler.java:29-35). None => always valid.
    commands: named single-partition-update methods
        (common/RPC.java:28-47 dispatch of @SinglePartitionCommand):
        name -> python fn(current_value, *args) -> new_value, applied
        atomically per key outside the transactional graph.
    """

    name: str
    value_type: str = "double"
    default: Any = None
    invariant: str | None = None
    # python twin of `invariant` for the Arrow/pandas state path
    # (PL0/PL1 chains, py_update state functions, SPU commands);
    # fn(candidate_value) -> bool.
    py_invariant: Callable[[Any], bool] | None = None
    commands: dict[str, Callable[..., Any]] = field(default_factory=dict)

    def command(self, name: str):
        """Decorator: register a single-partition command."""

        def deco(fn: Callable[..., Any]):
            self.commands[name] = fn
            return fn

        return deco


UpdateExpr = Callable[[Column], Column]
"""Expression-form update: fn(current_value_col) -> new_value_col.
Record columns are referenced positionally via F.col(...) inside the
callable; runs fully JVM-side (whole-stage codegen)."""

UpdatePy = Callable[[Any, dict], Any]
"""General-form update: fn(current_value, record_dict) -> new_value.
Runs in the Arrow-batched pandas path; use only for value types that
Column expressions can't fold (e.g. list append with business logic)."""
