"""Physical-plan regression gate: the scale-critical plan invariants
(broadcasts, pushdown, pruning, shuffle counts) from tools/plan_audit
must hold. Failures here mean a query's plan silently degraded."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="driver testdata not present"
)


def test_plan_invariants(spark):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    audit = importlib.import_module("plan_audit")
    assert audit.main() == 0
