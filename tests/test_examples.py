"""The two end-to-end pipeline demos must run clean — they are the
user-facing composition of the catalog operators."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _run(script: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_curation_pipeline_runs_and_funnels(spark):
    stdout = _run("curation_pipeline.py")
    assert "input 500" in stdout and "committed snapshot" in stdout


def test_geospatial_pipeline_runs(spark):
    stdout = _run("geospatial_pipeline.py")
    assert "docs per polygon" in stdout and "committed snapshot" in stdout


def test_crawl_pipeline_runs_and_gates(spark):
    import json

    stdout = _run("crawl_pipeline.py")
    stats = json.loads(stdout.strip().splitlines()[-1])
    assert stats["pages"] == 600
    # the robots gate genuinely drops disallowed urls...
    assert 0 < stats["robots_allowed"] < stats["pages"]
    # ...the north-rule text identity holds end-to-end...
    assert stats["text_identity_divergent"] == 0
    # ...and every surviving url commits through the snapshot layer
    assert stats["committed_rows"] == stats["unique_urls"]


def test_multimodal_pipeline_runs(spark):
    stdout = _run("multimodal_pipeline.py")
    assert "MULTIMODAL_PIPELINE_OK" in stdout
    assert "'webp': 166" in stdout and "kept>=12px=379" in stdout
