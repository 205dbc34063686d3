"""Red-green fixture for the integer-division semantics ratchet
(tools/audit_div_semantics.py): the dividend extractor must respect
operator precedence (a - b div c divides only b), the minus detector
must see through nesting but honor greatest()/abs() guards, and the
r13 defect shapes that motivated the audit must flag."""

from __future__ import annotations

from tools.audit_div_semantics import (
    dividend_of,
    finding_key,
    scan_text,
    unguarded_minus,
)


def _flags(sql: str) -> list[str]:
    return [
        f["dividend"] for f in scan_text(sql, "t") if not f["allowed"]
    ]


def test_r13_bbit_defect_shape_flags():
    # The ORIGINAL b-bit estimator: parenthesized subtraction divided.
    assert _flags("CAST((2 * bm - 12) * 1000000 // 12 AS BIGINT)")
    # The rewritten non-negative form passes.
    assert not _flags("CAST(bm * 2000000 // 12 - 1000000 AS BIGINT)")


def test_precedence_bounds_the_dividend():
    # a - b div c: only b is divided — no flag.
    assert not _flags("SELECT a - b // c FROM t")
    assert dividend_of("a - b // c", "a - b ".__len__()) == "b"


def test_greatest_and_abs_guards_pass():
    assert not _flags("greatest(s1 - s2, 0) * 1000000 // n")
    assert not _flags("CAST(abs(x - y) DIV k AS BIGINT)")
    # ...but an unguarded sibling still flags.
    assert _flags("(greatest(a - b, 0) + (c - d)) // n")


def test_spark_div_keyword_and_case():
    assert _flags("CAST((x - y) DIV n AS BIGINT)")
    assert _flags("CAST((x - y) div n AS BIGINT)")


def test_unary_minus_is_not_a_subtraction():
    assert not unguarded_minus("-x * 3")
    assert not _flags("SELECT (-x) // 2")


def test_sql_comments_are_stripped():
    assert not _flags("SELECT a // b  -- note: (x - y) // z in prose\n")


def test_finding_key_drops_line_numbers():
    assert finding_key("ops/foo.py:123", "a -  b") == finding_key(
        "ops/foo.py:456", "a - b"
    )


def test_live_tree_ratchet_clean():
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(
        os.path.join(repo, "tools", "div_semantics_baseline.json")
    ) as f:
        assert len(json.load(f)["reviewed_sites"]) > 50
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "audit_div_semantics.py")],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CLEAN" in r.stdout
