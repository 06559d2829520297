"""Cardinality injection (optimizer/injection.py) — runs in a subprocess
because the Hive catalog implementation is fixed at first-session creation
per JVM, and the shared test session is in-memory-cataloged."""

from __future__ import annotations

import subprocess
import sys


def test_injection_demo_subprocess():
    proc = subprocess.run(
        [sys.executable, "scripts/demo_injection.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=".",
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
    assert "7/7 passed" in proc.stdout
