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
