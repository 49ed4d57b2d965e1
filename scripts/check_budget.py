"""Facet-budget invariant checker.

The driver's correctness gate runs roughly the FIRST 50 entries of
__spark_entry__.queries() per round, so the standing invariant is:

  * every facet with no prior green CORRECTNESS row sits inside the
    first 50 slots;
  * the union of the latest rounds' checked sets covers every facet.

Run after ANY edit to the queries() dict:
    python scripts/check_budget.py [CORRECTNESS_r03.json ...]
Exits non-zero on a violation.  Default priors: every CORRECTNESS_r*.json
in the repo root."""

import glob
import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
BUDGET = 50


def main():
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(ROOT, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = list(m.queries())
    o = m.oracle_sql()
    priors = sys.argv[1:] or sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    checked: set[str] = set()
    for p in priors:
        j = json.load(open(p))
        checked |= set(j.get("queries", j).keys())
    missing_oracle = [k for k in q if k not in o]
    past = [k for k in q[BUDGET:] if k not in checked]
    slack = [k for k in q[:BUDGET] if k in checked]
    uncovered = [k for k in q[BUDGET:] if k not in checked]
    print(f"facets: {len(q)}  priors: {len(priors)} files, "
          f"{len(checked)} facets checked before")
    print(f"slack (prior-green inside first {BUDGET}): {slack or 'none'}")
    print(f"never-checked past {BUDGET}: {past or 'none'}")
    ok = not past and not missing_oracle
    if missing_oracle:
        print(f"FACETS WITHOUT ORACLE: {missing_oracle}")
    if uncovered:
        print(f"UNION GAP (would stay unchecked): {uncovered}")
        ok = False
    print("OK" if ok else "VIOLATION")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
