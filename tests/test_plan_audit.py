"""Engine-wide plan-hygiene gate: no registered query may introduce a
scale anti-pattern (cartesian product, row-at-a-time Python eval,
single-partition or global-sort exchange) without a documented
justification in tools/plan_audit.py's ALLOW table.

This is the regression net behind the per-query plan pins in
test_plan_pushdown.py: a NEW query (or an edit to an old one) that
plans badly fails here even if nobody wrote it a dedicated test.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_no_unallowed_plan_antipatterns(spark):
    from plan_audit import audit

    failures = audit()
    assert failures == {}, f"plan anti-patterns: {failures}"
