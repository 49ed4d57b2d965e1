"""The facet-budget invariant, enforced in the suite: every facet
without a prior green CORRECTNESS row must sit inside the driver's
~50-slot window, every facet must have an oracle, and the round union
must cover everything (scripts/check_budget.py)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_facet_budget_invariant():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "check_budget.py")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout


def test_every_lazy_export_resolves():
    """parquet_spark._EXPORTS is the public API index — a renamed or
    moved function must fail the suite, not a user's import."""
    import parquet_spark as P
    for name in P._EXPORTS:
        assert getattr(P, name) is not None, name
