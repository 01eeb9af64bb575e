"""Opt-in pytest wrapper for the registry-wide determinism sweep.

The sweep (tools/determinism_sweep.py) is the mechanical gate for the
bug class the r11/r12 reviews found one instance at a time: results
that depend on physical layout rather than data. It runs every registry
query under two adversarial layouts (different shuffle/scan confs AND a
seeded whole-row-hash scan scramble) and requires bit-identical output.

Gated behind ``SPARK_GRAFT_SWEEP_TEST=1`` like the 10x scale suite —
the full A/B double-run over 238 queries is ~20 minutes, far beyond the
default suite budget, but this wrapper makes it a one-env-var pytest
re-run instead of tribal knowledge:

    SPARK_GRAFT_SWEEP_TEST=1 python -m pytest tests/test_determinism_sweep.py -q

The selftest (harness soundness: a planted row_number-over-ties bug
must DIFF under the scramble, its totally-ordered twin must not) runs
FIRST so a green sweep can never be vacuous.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_TEST"),
    reason="determinism sweep is opt-in (SPARK_GRAFT_SWEEP_TEST=1)",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "determinism_sweep.py")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, _TOOL, *args],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )


def test_sweep_selftest_is_sound():
    """The harness must detect the planted layout-sensitive bug and pass
    its totally-ordered twin — run before trusting any green sweep."""
    proc = _run("--selftest")
    assert proc.returncode == 0, f"selftest failed:\n{proc.stdout}\n{proc.stderr}"


def test_full_registry_is_layout_invariant():
    proc = _run()
    assert proc.returncode == 0, (
        f"layout-sensitive queries found:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
