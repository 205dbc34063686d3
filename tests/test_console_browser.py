"""Flag-gated REAL-browser console test (reference parity target:
test-console.js:30-44, which drives the console with puppeteer +
Chromium).

The sandbox has no browser binary, so the gate here is: set
``KBROWSE_BROWSER_BIN`` (or have chromium/google-chrome on PATH) and
this test drives the actual console page in a real browser engine —
headless Chromium with ``--dump-dom`` and a virtual-time budget, which
executes the page's scripts (including the /server-configs and /topics
fetches against the live service) before serializing the DOM.  The
always-on gate for the console script remains tests/test_console_dom.py
(node vm + DOM shim); this file adds real-engine execution wherever a
browser exists.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import threading

import pytest


def _browser_bin() -> str | None:
    env = os.environ.get("KBROWSE_BROWSER_BIN")
    if env and os.path.exists(env):
        return env
    for name in ("chromium", "chromium-browser", "google-chrome", "chrome"):
        found = shutil.which(name)
        if found:
            return found
    return None


BROWSER = _browser_bin()

pytestmark = pytest.mark.skipif(
    BROWSER is None,
    reason="no browser binary found (set KBROWSE_BROWSER_BIN to enable)",
)


@pytest.fixture(scope="module")
def live_service():
    """The real Flask app on a real socket (werkzeug in a thread) —
    the same create_app() the production entry point serves."""
    from werkzeug.serving import make_server

    from kbrowse_spark.service.app import create_app

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_server("127.0.0.1", port, create_app(), threaded=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{port}"
    finally:
        srv.shutdown()


def _dump_dom(url: str, budget_ms: int = 5000) -> str:
    out = subprocess.run(
        [
            BROWSER,
            "--headless=new",
            "--disable-gpu",
            "--no-sandbox",
            "--disable-dev-shm-usage",
            f"--virtual-time-budget={budget_ms}",
            "--dump-dom",
            url,
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_console_boots_and_fetches_in_real_browser(live_service):
    """The console page must load in a real engine and its startup
    script must run: the cluster selector's default option is rewritten
    from the /server-configs fetch (main.js:116-144 parity behavior),
    which only happens if real JS executed against the real service."""
    dom = _dump_dom(live_service + "/")
    assert "kbrowse-spark console" in dom
    # The static HTML ships '(default)'; the script rewrites it to
    # 'default (<servers>)' after the /server-configs fetch resolves.
    assert "default (" in dom, "startup fetch did not rewrite cluster option"
