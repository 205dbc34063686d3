#!/usr/bin/env python
"""Audit verification-claim/code agreement for every registered query.

Round 9's one real defect was a docstring that claimed "the oracle is
the DIRECT quadratic join" while the registered oracle was the same
grid-blocking scheme rewritten in SQL — true in spirit, false in code,
and invisible to the hash gate because both sides shared the blocking
bug surface.  This checker makes that class of drift mechanical:

For every ``@register(...)``'d query it extracts (a) the decorator
call's SOURCE text (so f-string helper interpolations like
``{_grid_cell('x')}`` are visible pre-evaluation, and so are comments
inside the register call), (b) the function docstring, (c) the
function body source, and (d) the EVALUATED oracle SQL from the
catalog.  Then, for every *claim sentence* — a docstring/decorator
sentence that mentions the oracle together with an independence-style
assertion ("independent", "quadratic", "NOT EXISTS", "all-pairs",
"direct") — it enforces:

1. SHARED-HELPER rule: a claim of an independent formulation is
   incompatible with the oracle source interpolating a private module
   helper (``_foo(...)`` / ``{_foo}``) that the Spark builder body
   also uses — shared formulation machinery is exactly how the r9
   spatial oracle silently became non-independent.  Helpers that are
   *value-formatting only* (never encode the formulation) may be
   allowlisted below with a justification.
2. QUADRATIC-SIGNATURE rule: a claim that the oracle is the
   quadratic / all-pairs / NOT-EXISTS formulation requires the
   evaluated SQL to actually contain one: ``NOT EXISTS``, or a
   self-join inequality ``x.col < y.col`` on the same column of two
   aliases, or an explicit cross/self join with a ``<`` key bound.

Exit 0 with a summary when clean; exit 1 listing every flagged
(query, sentence, evidence) triple otherwise.  Wired into
tools/run_all_checks.sh.  Pure source analysis + catalog import — no
Spark session, no DuckDB execution; runs in ~1s.
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPERATOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kbrowse_spark",
    "operators",
)

# Value-formatting helpers that may legitimately appear in BOTH the
# oracle SQL and the Spark body without compromising formulation
# independence.  Every entry must carry a justification.
SHARED_HELPER_ALLOWLIST: dict[str, str] = {
    # sql_dsum/dsum render an exact decimal SUM of a float column; the
    # aggregation *grouping/joining structure* — the thing a
    # formulation claim is about — is untouched.  Sharing them is the
    # determinism contract (bit-equal totals), not a shared plan.
    "sql_dsum": "decimal-exact SUM formatter; encodes no join/blocking structure",
    "dsum": "Spark twin of sql_dsum",
}

CLAIM_WORDS = re.compile(
    r"\b(independent|quadratic|all-pairs|NOT EXISTS|direct)\b", re.I
)
ORACLE_WORD = re.compile(r"\boracle\b", re.I)
QUADRATIC_WORDS = re.compile(r"\b(quadratic|all-pairs|NOT EXISTS)\b", re.I)
# A "the oracle IS the quadratic formulation" claim, vs. merely
# mentioning that an invariant TEST compares against a quadratic truth.
NEGATED = re.compile(r"\b(no|not|never|instead of|rather than|without)\b", re.I)

# Flag only CALLS of private lowercase helper functions inside the
# oracle f-string ({_grid_cell('x')} — SQL-expression *machinery*).
# Bare constant interpolations ({_EPS}, {_SEQ_TOP}) are *parameters*:
# both formulations MUST share the same eps/k/phrase to compute the
# same answer, so sharing them never compromises independence.
HELPER_USE = re.compile(r"\{\s*(_[a-z][A-Za-z0-9_]*)\s*\(")
SELF_JOIN_LT = re.compile(
    r"\b([A-Za-z_]\w*)\.(\w+)\s*<\s*([A-Za-z_]\w*)\.\2\b"
)


def sentences(text: str) -> list[str]:
    # Split on sentence ends; keep it dumb — claims are short sentences.
    return [s.strip() for s in re.split(r"(?<=[.!?])\s+|\n\s*\n", text) if s.strip()]


def decorator_register_args(fn: ast.FunctionDef, src: str):
    for dec in fn.decorator_list:
        if (
            isinstance(dec, ast.Call)
            and (
                (isinstance(dec.func, ast.Name) and dec.func.id == "register")
                or (
                    isinstance(dec.func, ast.Attribute)
                    and dec.func.attr == "register"
                )
            )
            and dec.args
        ):
            name = dec.args[0]
            qname = name.value if isinstance(name, ast.Constant) else None
            return qname, ast.get_source_segment(src, dec) or ""
    return None, None


def audit(operator_dir: str = OPERATOR_DIR, registry=None) -> int:
    """Returns the number of flags (0 = clean).  `registry` injectable
    for the checker's own regression test (tests/test_tools_checks.py
    feeds it the r9-era grid-formulated oracle and asserts it flags)."""
    if registry is None:
        from kbrowse_spark.catalog import all_queries

        registry = all_queries()
    flags: list[tuple[str, str, str]] = []
    n_claims = 0

    for fname in sorted(os.listdir(operator_dir)):
        if not fname.endswith(".py"):
            continue
        path = os.path.join(operator_dir, fname)
        src = open(path).read()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            qname, dec_src = decorator_register_args(node, src)
            if qname is None or qname not in registry:
                continue
            doc = ast.get_docstring(node) or ""
            body_src = ast.get_source_segment(src, node) or ""
            # body WITHOUT the decorator (so oracle-side helper use
            # isn't double-counted as builder-side use)
            body_only = body_src.replace(dec_src or "", "")
            oracle = registry[qname].oracle or ""

            claim_sents = [
                s
                for s in sentences(doc) + sentences(dec_src or "")
                if ORACLE_WORD.search(s) and CLAIM_WORDS.search(s)
            ]
            if not claim_sents:
                continue
            n_claims += 1

            # Rule 1: shared formulation helper under an independence claim.
            helpers = set(HELPER_USE.findall(dec_src or ""))
            shared = {
                h
                for h in helpers
                if h not in SHARED_HELPER_ALLOWLIST
                and re.search(rf"\b{re.escape(h)}\b", body_only)
            }
            if shared:
                flags.append(
                    (
                        qname,
                        claim_sents[0][:140],
                        f"oracle interpolates helper(s) {sorted(shared)} "
                        "also used by the Spark builder — formulation is "
                        "shared, not independent",
                    )
                )

            # Rule 2: quadratic claims need a quadratic SQL signature.
            # Strip the phrase "NOT EXISTS" before the negation check:
            # its NOT is part of the claimed formulation's NAME, not a
            # negation of the claim ("oracle keeps the quadratic NOT
            # EXISTS" is a positive claim).
            quad_sents = [
                s
                for s in claim_sents
                if QUADRATIC_WORDS.search(s)
                and not NEGATED.search(
                    re.sub(r"NOT\s+EXISTS", "", s, flags=re.I)
                )
            ]
            if quad_sents:
                has_sig = (
                    re.search(r"NOT\s+EXISTS", oracle, re.I) is not None
                    or SELF_JOIN_LT.search(oracle) is not None
                )
                if not has_sig:
                    flags.append(
                        (
                            qname,
                            quad_sents[0][:140],
                            "claims a quadratic/all-pairs/NOT-EXISTS oracle "
                            "but the registered SQL has no self-join "
                            "inequality and no NOT EXISTS",
                        )
                    )

    print(
        f"audit_oracle_claims: {len(registry)} queries, "
        f"{n_claims} with oracle-independence claims, {len(flags)} flagged"
    )
    for qname, sent, why in flags:
        print(f"FLAG {qname}\n  claim: {sent}\n  why:   {why}")
    return len(flags)


if __name__ == "__main__":
    sys.exit(1 if audit() else 0)
