"""Query registry: the single source for ``__spark_entry__.queries()``
and ``oracle_sql()``.

Each module (relational, windows, dedup, text, similarity, txn) calls
``register(name, spark_fn, duckdb_sql)``; the driver contract file just
re-exports the collected dicts. ``duckdb_sql=None`` marks an operator
whose semantics are not ANSI-SQL-expressible (custom stateful streaming
etc.) — the driver then records a rows-only check.

Determinism contract for every entry:
  - column names identical between the Spark result and the oracle
    (the driver sorts columns by name before value-hashing);
  - floating-point aggregates are integer-scaled (round half-up at a
    fixed scale, then BIGINT sum) so the values are bit-identical across
    engines regardless of summation order;
  - no nondeterministic functions, no ties broken by arbitrary order
    (every top-k / limit has a total tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryEntry:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    duckdb_sql: str | None


_REGISTRY: dict[str, QueryEntry] = {}


def register(name: str, duckdb_sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryEntry(name, fn, duckdb_sql)
        return fn

    return deco


# The driver checks only the first 50 registry entries per round.  Order
# by *risk*: the transactional and streaming entries exercise the
# engine's novel mechanisms (epoch commit, isolation, stateful
# streaming) whose code moves most rounds, so they lead — but only in
# rounds where that code actually moved.  A high-risk entry keeps its
# reserved slot iff (a) its last driver run was red, (b) it has never
# been driver-checked, or (c) any of the modules implementing the
# transactional/streaming engine changed since the round of its last
# driver row (git-diff-aware, uncommitted worktree changes included).
# Otherwise the entry is demoted into the staleness rotation: a stable
# suite that hasn't changed does not need a permanent reservation, it
# needs periodic evidence, which staleness ordering guarantees
# (round-5 verdict "What's wrong" #2 — 19 permanently reserved slots
# would have starved the never-checked drain).
_HIGH_RISK_PREFIXES = (
    "txn_",
    "streaming_",
)

# Modules whose change re-activates the high-risk reservation.  This is
# the full implementation surface of the txn_/streaming_ entries: the
# epoch/commit/isolation core, the structured-streaming twins, the
# deterministic sources feeding both, the query modules that register
# the entries themselves, and their shared dependencies (ADVICE r6:
# helpers.py carries the fixed/dd_fixed determinism scaling, relational
# the table loader, dedup the simhash CTEs imported by
# streaming_native — a change there can alter txn_/streaming_ results
# while a narrower watch list reads "engine unchanged").  False keeps
# are cheap; false demotions defer evidence.
_HIGH_RISK_WATCH = (
    "t_spoon_spark/tx",
    "t_spoon_spark/streaming",
    "t_spoon_spark/sources",
    "t_spoon_spark/queries/txn.py",
    "t_spoon_spark/queries/streaming_native.py",
    "t_spoon_spark/queries/helpers.py",
    "t_spoon_spark/queries/relational.py",
    "t_spoon_spark/queries/dedup.py",
)

# Within the never-driver-checked tier, these lead: they exercise novel
# MECHANISMS (driver-side iteration loops, localCheckpoint lineage cuts,
# an applyInPandas sequential fold, recursive-CTE oracles) rather than
# plain column algebra, so their first driver run carries the most
# information. Everything else in the tier follows in registration
# order and drains over subsequent rounds.
_NOVEL_MECHANISM_FIRST = (
    "packing_greedy_whole_doc",
    "clustering_kmeans_fixed",
    "graph_pagerank_nations",
    "graph_label_propagation",
    "graph_triangle_parts",
    "similarity_pq_adc_topk",
    "bloom_semi_join_orders",
    "io_csv_roundtrip_docs",
    # round-7 additions with novel mechanisms: driver-side BPE merge
    # loop, nested-WITH oracle composition, full-outer stream-stream
    # drain, bucketed write/read round-trip, K-round CTE replays
    "text_bpe_learn_merges",
    "similarity_ann_recall_report",
    "streaming_interval_join_full_outer",
    "io_bucketed_colocated_join",
    "graph_bfs_hop_frontier",
    "sample_kcenter_coreset",
)


def _correctness_history() -> tuple[dict[str, int], set[str], int]:
    """Parse the driver's ``CORRECTNESS_r*.json`` artifacts.

    Returns ``(last_round, last_run_red, round_count)``:
      - *last_round*: name -> index of the most recent artifact carrying
        a row for it (ever-checked = membership in this dict);
      - *last_run_red*: names whose most recent driver row failed
        (rows/schema/hash mismatch or an error);
      - *round_count*: number of artifacts seen.

    Falls back to empty/zero anywhere the artifacts aren't visible
    (unit tests, vanilla sessions) — ordering stays valid either way.
    """
    try:
        import glob
        import json
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        last_round: dict[str, int] = {}
        latest: dict[str, bool] = {}
        for i, path in enumerate(files):
            try:
                with open(path) as fh:
                    data = json.load(fh)
            except Exception:
                continue
            for name, row in data.items():
                last_round[name] = i
                ok = (
                    bool(row.get("rows_match"))
                    and bool(row.get("schema_match"))
                    and row.get("hash_match") in (True, None)
                    and row.get("err") in (None, "")
                )
                latest[name] = ok
        red = {n for n, ok in latest.items() if not ok}
        return last_round, red, len(files)
    except Exception:
        return {}, set(), 0


_CHANGED_CACHE: dict[int, bool] = {}
_CHANGED_FILES_CACHE: dict[int, frozenset] = {}
_SAME_CODE_CACHE: dict[tuple[str, str], bool] = {}


def _ast_fingerprint(src: str) -> str | None:
    """Canonical dump of a module's AST with every docstring normalized
    to the empty string — two sources with the same fingerprint differ
    only in comments, whitespace/formatting, or docstring TEXT, none of
    which can change what a registered query computes.  ``None`` on a
    parse failure (caller must treat as changed)."""
    import ast

    try:
        tree = ast.parse(src)
    except (SyntaxError, ValueError):
        return None
    doc_owners = (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
    for node in ast.walk(tree):
        if isinstance(node, doc_owners):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body[0].value.value = ""
    return ast.dump(tree)


def _same_runtime_code(root: str, commit: str, rel: str) -> bool:
    """True iff ``rel`` is a Python file whose AST (docstrings
    normalized) is identical between ``commit`` and the worktree — i.e.
    the recorded change is comment/docstring/formatting-only and cannot
    have altered any entry's output.  Round-11: without this, a one-line
    docstring correction in a watched module would re-reserve ~20
    high-risk window slots (or promote a whole query module) and starve
    the staleness drain for a change that provably cannot change
    results.  Any state this cannot verify (non-.py, unreadable,
    deleted, added, parse failure) reads as CHANGED — the conservative
    default is preserved."""
    if not rel.endswith(".py"):
        return False
    key = (commit, rel)
    if key in _SAME_CODE_CACHE:
        return _SAME_CODE_CACHE[key]
    same = False
    try:
        import os
        import subprocess

        with open(os.path.join(root, rel), encoding="utf-8") as fh:
            cur = fh.read()
        old = subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=root,
            capture_output=True,
            text=True,
            timeout=20,
            check=True,
        ).stdout
        a, b = _ast_fingerprint(old), _ast_fingerprint(cur)
        same = a is not None and a == b
    except Exception:
        same = False
    _SAME_CODE_CACHE[key] = same
    return same


def _changed_files_since(round_idx: int) -> frozenset:
    """Repo-relative paths changed since the commit that added the
    ``round_idx``-th CORRECTNESS artifact (committed diffs + staged/
    unstaged edits).  Empty set on any failure — the generic
    module-changed promotion below then simply doesn't fire (the
    high-risk reservation keeps its own conservative default)."""
    if round_idx in _CHANGED_FILES_CACHE:
        return _CHANGED_FILES_CACHE[round_idx]
    out: frozenset = frozenset()
    try:
        import glob
        import os
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        if 0 <= round_idx < len(files):
            rel = os.path.basename(files[round_idx])

            def _git(*args: str) -> str:
                return subprocess.run(
                    ["git", *args],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    timeout=20,
                    check=True,
                ).stdout

            commit = _git(
                "log", "--diff-filter=A", "--format=%H", "-n", "1", "--", rel
            ).strip()
            if commit:
                names = set(_git("diff", "--name-only", commit).splitlines())
                for line in _git("status", "--porcelain").splitlines():
                    p = line[3:].strip()
                    # rename records read 'old -> new'; the NEW path is
                    # what _entry_file will report for a live module
                    if " -> " in p:
                        p = p.split(" -> ", 1)[1]
                    names.add(p.strip('"'))
                # comment/docstring-only edits cannot change an entry's
                # output — drop them so they don't promote (round 11)
                out = frozenset(
                    n
                    for n in names
                    if n and not _same_runtime_code(root, commit, n)
                )
    except Exception:
        out = frozenset()
    _CHANGED_FILES_CACHE[round_idx] = out
    return out


def _entry_file(e: "QueryEntry") -> str | None:
    """Repo-relative source file that registered this entry."""
    try:
        import inspect
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return os.path.relpath(inspect.getfile(e.spark_fn), root)
    except Exception:
        return None


def _watched_changed_since(round_idx: int) -> bool:
    """True iff any ``_HIGH_RISK_WATCH`` path SEMANTICALLY changed since
    the commit that added the ``round_idx``-th CORRECTNESS artifact —
    committed changes, staged/unstaged edits, and untracked new files
    all count, except edits that are provably comment/docstring/
    formatting-only (``_same_runtime_code``, round 11).

    Conservative by construction: any state it cannot determine (no
    git, artifact never committed, subprocess failure, unverifiable
    path) reads as "changed", which keeps the reservation — the
    pre-round-6 behavior.
    """
    if round_idx in _CHANGED_CACHE:
        return _CHANGED_CACHE[round_idx]
    changed = True
    try:
        import glob
        import os
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        if 0 <= round_idx < len(files):
            rel = os.path.basename(files[round_idx])

            def _git(*args: str) -> str:
                return subprocess.run(
                    ["git", *args],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    timeout=20,
                    check=True,
                ).stdout

            commit = _git(
                "log", "--diff-filter=A", "--format=%H", "-n", "1", "--", rel
            ).strip()
            if commit:
                diff = _git("diff", "--name-only", commit, "--", *_HIGH_RISK_WATCH)
                status = _git("status", "--porcelain", "--", *_HIGH_RISK_WATCH)
                paths = set(diff.splitlines())
                for line in status.splitlines():
                    p = line[3:].strip()
                    if " -> " in p:
                        p = p.split(" -> ", 1)[1]
                    paths.add(p.strip('"'))
                # same semantic filter as _changed_files_since: a
                # docstring-only edit in a watched module must not
                # re-reserve the ~20 high-risk slots (round 11); any
                # path that cannot be verified identical keeps the
                # conservative "changed" reading
                changed = any(
                    not _same_runtime_code(root, commit, p)
                    for p in paths
                    if p
                )
    except Exception:
        changed = True
    _CHANGED_CACHE[round_idx] = changed
    return changed


def _keeps_reservation(name: str, last_round: dict[str, int], red: set[str]) -> bool:
    """Does this high-risk entry keep its reserved window slot?"""
    if name not in last_round or name in red:
        return True
    return _watched_changed_since(last_round[name])


def _ordered() -> list[QueryEntry]:
    """Risk-ordered registry: the driver checks only a 50-entry prefix
    per round, so order = high-risk mechanisms, then entries whose last
    driver run was RED (last-known-broken is the worst state — it must
    outrank merely-unchecked when the two tiers together overflow the
    window), then entries with *no* driver evidence yet, then everything
    else by STALENESS (oldest driver evidence first — an entry checked
    this round becomes the freshest and cycles to the back, so the
    whole stable suite rotates through the window without any entry
    starving).  A never-checked entry that overflows the window is
    pytest-oracle-green and simply waits one round; a red entry never
    waits (round-4 verdict, tightened in round 5 when the new-entry
    tier first outgrew the window).
    """
    entries = list(_REGISTRY.values())
    last_round, red, _rounds = _correctness_history()
    high = [
        e
        for e in entries
        if e.name.startswith(_HIGH_RISK_PREFIXES)
        and _keeps_reservation(e.name, last_round, red)
    ]
    high_names = {e.name for e in high}
    red_entries = [
        e
        for e in entries
        if e.name not in high_names and e.name in last_round and e.name in red
    ]
    never = [
        e for e in entries if e.name not in high_names and e.name not in last_round
    ]
    novel_rank = {n: i for i, n in enumerate(_NOVEL_MECHANISM_FIRST)}
    never.sort(key=lambda e: (novel_rank.get(e.name, len(novel_rank)),))
    taken = high_names | {e.name for e in never} | {e.name for e in red_entries}
    rest = [e for e in entries if e.name not in taken]
    order_idx = {e.name: i for i, e in enumerate(entries)}
    # module-changed promotion (generic twin of the high-risk watch
    # list, round-8; per-ENTRY predicate since round-9): an entry whose
    # DEFINING module changed since the ENTRY'S OWN last driver
    # evidence may have changed output — its green row proves nothing
    # about HEAD, so it outranks merely-unchecked staleness.  The r8
    # version compared against the latest artifact only, so a module
    # edited in round N-1 under an entry with round N-3 evidence was
    # silently never promoted (r8 verdict "What's missing" #2 — the
    # io_formats round-trips).  _changed_files_since caches per round
    # index, so this costs O(distinct evidence rounds) git calls, not
    # O(entries).
    changed_first = [
        e
        for e in rest
        if _entry_file(e) in _changed_files_since(last_round.get(e.name, -1))
    ]
    changed_names = {e.name for e in changed_first}
    rest_stale = [e for e in rest if e.name not in changed_names]
    changed_first.sort(key=lambda e: (last_round.get(e.name, -1), order_idx[e.name]))
    rest_stale.sort(key=lambda e: (last_round.get(e.name, -1), order_idx[e.name]))
    return high + red_entries + never + changed_first + rest_stale


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {e.name: e.spark_fn for e in _ordered()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {e.name: e.duckdb_sql for e in _ordered() if e.duckdb_sql is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import t_spoon_spark.queries.relational  # noqa: F401
    import t_spoon_spark.queries.relational2  # noqa: F401
    import t_spoon_spark.queries.advanced  # noqa: F401
    import t_spoon_spark.queries.windows  # noqa: F401
    import t_spoon_spark.queries.dedup  # noqa: F401
    import t_spoon_spark.queries.text  # noqa: F401
    import t_spoon_spark.queries.similarity  # noqa: F401
    import t_spoon_spark.queries.txn  # noqa: F401
    import t_spoon_spark.queries.multimodal  # noqa: F401
    import t_spoon_spark.queries.streaming_native  # noqa: F401
    import t_spoon_spark.queries.pipeline  # noqa: F401
    import t_spoon_spark.queries.sketch  # noqa: F401
    import t_spoon_spark.queries.curation  # noqa: F401
    import t_spoon_spark.queries.curation2  # noqa: F401
    import t_spoon_spark.queries.udx  # noqa: F401
    import t_spoon_spark.queries.analytics  # noqa: F401
    import t_spoon_spark.queries.retrieval  # noqa: F401
    import t_spoon_spark.queries.sampling  # noqa: F401
    import t_spoon_spark.queries.graph  # noqa: F401
    import t_spoon_spark.queries.packing  # noqa: F401
    import t_spoon_spark.queries.clustering  # noqa: F401
    import t_spoon_spark.queries.chunking  # noqa: F401
    import t_spoon_spark.queries.io_formats  # noqa: F401
    import t_spoon_spark.queries.io_formats2  # noqa: F401
    import t_spoon_spark.queries.bloomq  # noqa: F401
    import t_spoon_spark.queries.stats  # noqa: F401
    import t_spoon_spark.queries.drift  # noqa: F401
    import t_spoon_spark.queries.skyline  # noqa: F401
    import t_spoon_spark.queries.similarity2  # noqa: F401
    import t_spoon_spark.queries.dedup2  # noqa: F401
    import t_spoon_spark.queries.dataquality  # noqa: F401
    import t_spoon_spark.queries.forecast  # noqa: F401
    import t_spoon_spark.queries.corpus_ops  # noqa: F401

    _LOADED = True
