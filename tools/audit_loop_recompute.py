"""Audit: iterative loops that re-execute per-round subplans.

The defect class (found by hand in round 10's `bfs_multisource_hops`,
VERDICT r10 #1): a driver loop that runs an EAGER action every round
(checkpoint / count / collect) while carrying a LAZY loop variable —
e.g. ``frontier = nxt`` where ``nxt`` is an unmaterialized
join+distinct+anti plan.  Round h's eager action then re-executes
every prior round's delta plan: O(H^2/2) join executions instead of
O(H).  The rows are already sitting in the round's checkpointed
blocks; the fix is to derive the carried variable FROM the
checkpointed accumulator (``visited.filter(hop == h)``) or to cut its
lineage directly.

Mechanics (pure AST, no Spark session): for every function in
kbrowse_spark/{operators,streaming,functions}/*.py, walk each
for/while loop and classify every DataFrame-shaped assignment in the
body as CUT (outermost call is localCheckpoint / checkpoint /
_truncate_lineage / cached / a driver materialization) or LAZY
(contains plan-building ops — join/union/groupBy/... — over leaves
that are not all cut-in-body or loop-invariant).  Names propagate
through rebinds; statuses reach a fixpoint over two passes so a
loop-carried read sees its end-of-body status (the cross-iteration
edge).  A loop is FLAGGED when it (a) performs an eager per-round
action and (b) ends an iteration with a loop-carried LAZY variable —
exactly the r10 shape.  Loops with no in-loop action build ONE plan
executed once (the pagerank/BPE chained-attach pattern) and are safe
regardless of carried laziness.

r12 extension — the *cache-without-force* variant: ``cache()`` /
``persist()`` only earn CUT status because every loop here
materializes them with a same-round action, at which point later
rounds read blocks.  A loop that caches its CARRIED frame but never
executes anything that reaches it leaves every round's cache
unfilled: the "cut" variable is really one ever-growing lazy plan
(lineage depth H — the planning/stack blowup _truncate_lineage
exists to prevent), and under executor memory pressure the unfilled/
evicted caches reproduce the r10 O(H^2) recompute.  So a carried
name whose assignment is an un-forced cache/persist is FLAGGED when
the loop runs eager actions; "forced" means some eager statement (or
an eager while-condition) transitively reads the name through the
body's assignment graph — cross-iteration forcing counts, since it
fills the previous round's cache before the chain grows.

Allow-listed findings carry a stated bound, same contract as
audit_plan_smells.ALLOW.  Exit 1 on any un-allowlisted flag.
"""

from __future__ import annotations

import ast
import glob
import os
import sys

# Chain methods that BUILD a plan worth money to re-execute.  Narrow
# column-only ops (select/filter/withColumn/alias) are deliberately
# absent: re-running a narrow op over checkpointed or cached blocks is
# a scan, not a join — the r10 fix itself carries
# ``visited.filter(hop == h)`` across rounds.
PLAN_OPS = {
    "join",
    "crossJoin",
    "union",
    "unionAll",
    "unionByName",
    "groupBy",
    "groupby",
    "agg",
    "distinct",
    "dropDuplicates",
    "repartition",
    "orderBy",
    "sort",
    "exceptAll",
    "intersect",
    "intersectAll",
    "subtract",
}
# Outermost calls that CUT lineage (or leave driver-side data, which
# cannot be re-executed at all).  cache/persist are lazy on their own
# but every loop here materializes them with a same-round action, at
# which point later rounds read blocks, not plans.
CUT_METHODS = {
    "localCheckpoint",
    "checkpoint",
    "cache",
    "persist",
    "collect",
    "count",
    "toPandas",
    "first",
    "head",
    "take",
}
CUT_FUNCS = {"_truncate_lineage", "cached", "cached_value"}
# Unions are concatenations, not transformations: a union whose every
# leaf is already cut re-executes as flat scans of stored blocks (the
# r14 bfs shape — checkpoint each round's DISJOINT frontier, carry the
# accumulator as a lazy union of those checkpoints; total materialized
# bytes O(|visited|) instead of re-writing the whole accumulator per
# round).  See the union-of-cut rule in _status_of.
_UNION_OPS = {"union", "unionAll", "unionByName"}
# Per-round driver actions that force execution (make re-derivation
# per round REAL instead of one deferred plan).  cache/persist alone
# force nothing.
EAGER_METHODS = (CUT_METHODS | {"save", "foreach", "show"}) - {
    "cache",
    "persist",
}
# pyspark.sql.functions is aliased `F` repo-wide; `F.count(...)` /
# `F.first(...)` are column expressions, not actions.
_FUNCS_ALIASES = {"F"}

ALLOW: dict[str, str] = {}


def _call_attr(node: ast.AST) -> str | None:
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
        recv = node.func.value
        if isinstance(recv, ast.Name) and recv.id in _FUNCS_ALIASES:
            return None  # F.count(...) et al: expressions, not actions
        return node.func.attr
    return None


def _call_name(node: ast.AST) -> str | None:
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        return node.func.id
    return None


def _leaf_names(expr: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(expr) if isinstance(n, ast.Name)}


def _has_plan_ops(expr: ast.AST) -> bool:
    return any(
        _call_attr(n) in PLAN_OPS
        for n in ast.walk(expr)
        if isinstance(n, ast.Call)
    )


def _status_of(expr: ast.AST, statuses: dict[str, str]) -> str:
    """'cut' | 'lazy' | 'plain' for an assignment RHS."""
    # Unwrap indexing/attribute shells: ``....collect()[0]`` and
    # ``....collect()[0].field`` are driver data — the cut is inside.
    core = expr
    while isinstance(core, (ast.Subscript, ast.Attribute, ast.Starred)):
        core = core.value
    if _call_attr(core) in CUT_METHODS or _call_name(core) in CUT_FUNCS:
        return "cut"
    if isinstance(expr, ast.Name):
        return statuses.get(expr.id, "plain")
    # A driver-side materialization ANYWHERE in the expression means
    # the result is plain Python data (e.g. a listcomp over collect()
    # rows), not a deferred plan.
    if any(
        _call_attr(n) in CUT_METHODS
        for n in ast.walk(expr)
        if isinstance(n, ast.Call)
    ):
        return "cut"
    lazy_leaf = any(
        statuses.get(n) == "lazy" for n in _leaf_names(expr)
    )
    if lazy_leaf:
        return "lazy"
    if _has_plan_ops(expr):
        # Union-of-cut (r14): when the ONLY plan ops in the expression
        # are unions, no leaf is lazy, and at least one leaf is a cut
        # (so the accumulator chain is anchored in stored blocks), the
        # result behaves like a cut — re-executing it is a flat
        # concatenation of checkpoint scans, exactly the "narrow op
        # over checkpointed blocks" the PLAN_OPS comment already
        # exempts.  A union with any lazy leaf, or mixed with real
        # transformations (join/distinct/groupBy/...), stays lazy.
        plan_calls = {
            _call_attr(n)
            for n in ast.walk(expr)
            if isinstance(n, ast.Call) and _call_attr(n) in PLAN_OPS
        }
        leaf_statuses = {statuses.get(n) for n in _leaf_names(expr)}
        if plan_calls <= _UNION_OPS and "cut" in leaf_statuses:
            return "cut"
        return "lazy"
    return "plain"


def _body_assigns(body: list[ast.stmt]):
    for stmt in body:
        for node in ast.walk(stmt):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    yield t.id, node.value


def _outermost_cache(expr: ast.AST) -> bool:
    """True when the RHS's outermost call (under indexing/attribute
    shells) is cache()/persist() — lazy on their own; CUT only if some
    eager statement actually reaches them."""
    core = expr
    while isinstance(core, (ast.Subscript, ast.Attribute, ast.Starred)):
        core = core.value
    return _call_attr(core) in {"cache", "persist"}


def _stmt_is_eager(stmt: ast.AST) -> bool:
    return any(
        _call_attr(n) in EAGER_METHODS or _call_name(n) in CUT_FUNCS
        for n in ast.walk(stmt)
        if isinstance(n, ast.Call)
    )


def _transitive_reads(root: ast.AST, deps: dict[str, set[str]]) -> set[str]:
    """Names an eager statement's execution reaches: its direct leaf
    names, expanded through the body's assignment graph (a count() on
    ``nxt`` executes — and fills the caches inside — everything
    ``nxt``'s plan was built from)."""
    seen: set[str] = set()
    frontier = set(_leaf_names(root))
    while frontier:
        n = frontier.pop()
        if n in seen:
            continue
        seen.add(n)
        frontier |= deps.get(n, set()) - seen
    return seen


def _audit_loop(loop: ast.For | ast.While) -> list[str]:
    """Names that end an iteration LAZY, are loop-carried, and share
    the body with an eager per-round action."""
    body = loop.body
    eager = any(
        _stmt_is_eager(stmt) for stmt in body
    )
    if not eager:
        return []
    # Loop-CARRIED = the value flows across iterations: the name is
    # read (by statement order) BEFORE its first assignment in the
    # body — including a self-referencing RHS (``cur = cur.select``)
    # and a while-loop's condition.  A name assigned first and read
    # only later the same round is same-iteration plumbing, not a
    # carry.
    first_assign: dict[str, int] = {}
    reads: dict[str, list[int]] = {}
    pre_body_reads: set[str] = set()
    if isinstance(loop, ast.While):
        pre_body_reads |= _leaf_names(loop.test)
    for i, stmt in enumerate(body):
        rhs_reads: set[str] = set()
        targets: set[str] = set()
        for n in ast.walk(stmt):
            if isinstance(n, ast.Name):
                if isinstance(n.ctx, ast.Load):
                    rhs_reads.add(n.id)
                elif isinstance(n.ctx, ast.Store):
                    targets.add(n.id)
        for r in rhs_reads:
            reads.setdefault(r, []).append(i)
        for t in targets:
            first_assign.setdefault(t, i)
    carried = {
        name
        for name in first_assign
        if name in pre_body_reads
        or any(i <= first_assign[name] for i in reads.get(name, []))
    }
    if not carried:
        return []
    # Two passes: the second sees end-of-body statuses for the
    # cross-iteration reads (fixpoint approximation).
    statuses: dict[str, str] = {}
    final_rhs: dict[str, ast.AST] = {}
    for _ in range(2):
        for name, rhs in _body_assigns(body):
            statuses[name] = _status_of(rhs, statuses)
            final_rhs[name] = rhs
    flagged = {n for n in carried if statuses.get(n) == "lazy"}
    # Cache-without-force (r12): a carried cache()/persist() RHS is
    # only a real cut if some eager statement's execution reaches the
    # name — otherwise the caches never fill and the carry is an
    # unbounded lazy chain (see module docstring).
    cached_carried = {
        n
        for n in carried - flagged
        if n in final_rhs and _outermost_cache(final_rhs[n])
    }
    if cached_carried:
        deps = {n: _leaf_names(r) for n, r in _body_assigns(body)}
        forced: set[str] = set()
        for stmt in body:
            if _stmt_is_eager(stmt):
                forced |= _transitive_reads(stmt, deps)
        if isinstance(loop, ast.While) and _stmt_is_eager(loop.test):
            forced |= _transitive_reads(loop.test, deps)
        flagged |= cached_carried - forced
    return sorted(flagged)


def audit_source(src: str, modname: str) -> list[tuple[str, str]]:
    """[(qualified_func, carried_lazy_name)] findings for one module."""
    tree = ast.parse(src)
    out: list[tuple[str, str]] = []
    for fn in [
        n
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]:
        for loop in [
            n for n in ast.walk(fn) if isinstance(n, (ast.For, ast.While))
        ]:
            for name in _audit_loop(loop):
                out.append((f"{modname}.{fn.name}", name))
    return out


def main() -> int:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    findings: list[tuple[str, str]] = []
    n_files = 0
    for sub in ("operators", "streaming", "functions", "sinks", "plans",
                "sources", "service"):
        for path in sorted(
            glob.glob(os.path.join(root, "kbrowse_spark", sub, "*.py"))
        ):
            n_files += 1
            mod = os.path.splitext(os.path.basename(path))[0]
            with open(path) as f:
                findings += audit_source(f.read(), mod)
    bad = 0
    for func, name in findings:
        if func in ALLOW:
            print(f"ALLOWED {func} carries lazy '{name}': {ALLOW[func]}")
        else:
            bad += 1
            print(
                f"FLAG {func}: loop-carried variable '{name}' stays LAZY "
                f"across rounds while the loop runs eager actions — each "
                f"round re-executes prior rounds' delta plans (the r10 "
                f"bfs_multisource_hops defect).  Cut its lineage or derive "
                f"it from the checkpointed accumulator."
            )
    print(f"(files audited: {n_files}, loops flagged: {len(findings)})")
    print("CLEAN (modulo allowed)" if bad == 0 else f"{bad} FLAGGED")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
