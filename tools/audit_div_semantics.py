"""Integer-division semantics audit (r13).

Defect class: Spark's ``div`` truncates toward zero while DuckDB's
``//`` floors, so an integer division whose DIVIDEND can be negative
silently diverges by 1 between the engines — a hash mismatch that only
fires when the data makes the dividend negative (it surfaced twice in
r13: the b-bit estimator ``(2*bm - k) * 1e6 // k`` rewritten to the
non-negative ``bm*2e6//k - 1e6``, and the KL/Zipf totals clamped with
``greatest(0, .)`` before dividing).

The audit walks every oracle SQL string in the live catalog plus every
non-docstring string literal in the engine source (Spark-dialect
``div`` lives in F.expr text).  For each integer-division site it
extracts the DIVIDEND — a backward balanced-paren scan bounded at
top-level ``+``/``-``/boundary keywords, because division binds
tighter than addition, so ``a - b div c`` divides only ``b`` — and
flags any dividend containing a binary minus (at any paren depth) that
is not enclosed in ``greatest(`` / ``abs(``, the two idioms that prove
non-negativity locally.  Subtractions that are non-negative for a
NON-LOCAL reason carry an ALLOW entry with the reason, same pattern as
the other audits.

Heuristic, not a prover — and the existing catalog contains ~120
STRUCTURALLY non-negative subtraction dividends (`rank - 1`,
`n * (n - 1)`, `length(s) - length(replace(s, .))`, ordered-pair
timestamp gaps, `pass - member` under a no-false-negative contract…),
every one hash-verified against DuckDB across 13 rounds of sweeps.  So
the gate is a RATCHET: the reviewed stock is frozen in
``div_semantics_baseline.json`` (keys are (origin-file/query,
normalized dividend) — line numbers excluded so unrelated edits don't
churn it) and the audit FAILS only on sites not in the baseline.  A
new flagged site means: rewrite it into the non-negative form (the
r13 b-bit/KL/Zipf discipline), guard it, or — after actually proving
non-negativity — re-run with ``--update-baseline`` and say why in the
commit.

Red-green fixture: tests/test_div_semantics_audit.py.
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# EXACT whitespace-normalized dividend -> reason the subtraction
# cannot go negative.  Anchored to the FULL normalized dividend
# (ADVICE r13 #2): the previous substring containment ('* sxx',
# 'hi - lo', 's - smin') silently allowed any future unrelated
# negative-capable dividend that happened to contain the fragment,
# weakening the ratchet this tool exists to enforce.  A new guarded
# site must add its own full-dividend entry with its own proof.
ALLOW: dict[str, str] = {
    "((2 * cum_desc + c + 1 - 1) * 10)": (
        "rank midpoint: cum_desc >= 0, c >= 1, so the +1-1 "
        "cancellation stays >= 0 (decile rank arithmetic)"
    ),
    "(s - smin) * 10": (
        "s >= smin by definition (score-range scaling)"
    ),
    "* (n_docs - df + 1)": (
        "document frequency df <= n_docs by definition "
        "(Robertson idf numerator)"
    ),
}


def _norm_dividend(dv: str) -> str:
    return " ".join(dv.split())


_BOUNDARY = re.compile(
    r"(?:\bSELECT\b|\bWHEN\b|\bTHEN\b|\bELSE\b|\bAND\b|\bOR\b|\bWHERE\b"
    r"|\bAS\b|\bFROM\b|\bON\b|\bBY\b|,|\bCASE\b|\bIF\b|=|>=|<=|<|>|\|\|)",
    re.IGNORECASE,
)


def _strip_sql_comments(text: str) -> str:
    return re.sub(r"--[^\n]*", "", text)


def dividend_of(text: str, op_start: int) -> str:
    """Backward scan from the division operator to the start of the
    dividend TERM: balanced parens, stopping at an unbalanced '(' or,
    at depth 0, a top-level '+'/'-' (division binds tighter) or a SQL
    boundary token."""
    depth = 0
    i = op_start - 1
    start = 0
    while i >= 0:
        ch = text[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                start = i + 1
                break
            depth -= 1
        i -= 1
    frag = text[start:op_start]
    # Find the last top-level term boundary inside the fragment.
    best = 0
    d = 0
    j = 0
    while j < len(frag):
        c = frag[j]
        if c == "(":
            d += 1
        elif c == ")":
            d -= 1
        elif d == 0:
            if c in "+-":
                prev = frag[:j].rstrip()
                if prev and (prev[-1].isalnum() or prev[-1] in ")_%"):
                    best = j + 1
                    j += 1
                    continue
            m = _BOUNDARY.match(frag, j)
            if m and m.end() > j:
                best = m.end()
                j = m.end()
                continue
        j += 1
    return frag[best:].strip()


def unguarded_minus(expr: str) -> bool:
    """A binary minus anywhere in the dividend not inside a
    greatest(/abs( call."""
    stack: list[str] = []
    ident = re.compile(r"[A-Za-z_][A-Za-z_0-9.]*$")
    j = 0
    while j < len(expr):
        c = expr[j]
        if c == "(":
            m = ident.search(expr[:j].rstrip())
            stack.append((m.group(0).lower() if m else ""))
        elif c == ")":
            if stack:
                stack.pop()
        elif c == "-":
            prev = expr[:j].rstrip()
            is_binary = bool(prev) and (
                prev[-1].isalnum() or prev[-1] in ")_%"
            )
            if is_binary and not any(
                f.endswith(("greatest", "abs")) for f in stack
            ):
                return True
        j += 1
    return False


_DIV_RE = re.compile(r"(?://|\bdiv\b)", re.IGNORECASE)


def scan_text(text: str, origin: str) -> list[dict]:
    text = _strip_sql_comments(text)
    out = []
    for m in _DIV_RE.finditer(text):
        dv = dividend_of(text, m.start())
        if not dv:
            continue
        if unguarded_minus(dv):
            allowed = _norm_dividend(dv) in ALLOW
            out.append(
                {"origin": origin, "dividend": dv, "allowed": allowed}
            )
    return out


def _expr_string_literals(path: str):
    """Non-docstring string constants in a source file."""
    try:
        tree = ast.parse(open(path).read())
    except SyntaxError:
        return
    docstrings: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef),
        ):
            body = getattr(node, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                docstrings.add(id(body[0].value))
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in docstrings
            and _DIV_RE.search(node.value)
        ):
            yield node.lineno, node.value


BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "div_semantics_baseline.json"
)


def finding_key(origin: str, dividend: str) -> str:
    """Stable key: origin without the line number + normalized text."""
    org = re.sub(r":\d+$", "", origin)
    return f"{org} :: {' '.join(dividend.split())}"


def collect_findings() -> tuple[list[dict], int]:
    findings: list[dict] = []
    from kbrowse_spark.catalog import all_queries

    for name, q in sorted(all_queries().items()):
        if q.oracle:
            findings += scan_text(q.oracle, f"oracle:{name}")
    n_files = 0
    for root, _dirs, files in os.walk(os.path.join(REPO, "kbrowse_spark")):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(root, fn)
            n_files += 1
            rel = os.path.relpath(p, REPO)
            for lineno, lit in _expr_string_literals(p):
                findings += scan_text(lit, f"{rel}:{lineno}")
    return findings, n_files


def main() -> int:
    import json

    findings, n_files = collect_findings()
    keys = sorted({finding_key(f["origin"], f["dividend"]) for f in findings})

    if "--update-baseline" in sys.argv:
        with open(BASELINE_PATH, "w") as f:
            json.dump({"reviewed_sites": keys}, f, indent=1)
        print(f"baseline updated: {len(keys)} reviewed sites")
        return 0

    baseline: set[str] = set()
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = set(json.load(f).get("reviewed_sites", []))

    new = [
        f
        for f in findings
        if finding_key(f["origin"], f["dividend"]) not in baseline
        and not f["allowed"]
    ]
    for f in new:
        print(
            f"BAD  {f['origin']}: NEW negative-capable dividend"
            f" `{' '.join(f['dividend'].split())[:120]}` — rewrite"
            " non-negative, guard with greatest()/abs(), or prove +"
            " --update-baseline"
        )
    print(
        f"(files scanned: {n_files}; subtraction-dividend sites:"
        f" {len(keys)}; baseline: {len(baseline)}; NEW: {len(new)})"
    )
    if new:
        print(f"{len(new)} FLAGGED")
        return 1
    print("CLEAN (ratchet: no new unreviewed sites)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
