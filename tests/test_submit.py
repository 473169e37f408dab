"""North-rule packaging gate: the pipeline runs via
``spark-submit --py-files dist/georaster_spark.zip`` in a fresh JVM,
and re-running against the same output resumes as a no-op."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None or not os.path.isdir(SF_SMALL),
    reason="spark-submit or testdata unavailable",
)


def _submit(pyfiles: str, output: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", pyfiles,
        os.path.join(REPO, "jobs", "flagship_job.py"),
        "--sf-dir", SF_SMALL,
        "--output", output,
        "--parts", "16",
    ]
    env = {**os.environ}
    env.pop("PYTHONPATH", None)  # executors must import from the zip
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env, cwd=REPO
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_runs_and_resumes(tmp_path):
    zip_path = subprocess.check_output(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        text=True, cwd=REPO,
    ).strip()
    with zipfile.ZipFile(zip_path) as zf:
        assert "georaster_spark/__init__.py" in zf.namelist()

    out = str(tmp_path / "flagship_out")
    r1 = _submit(zip_path, out)
    assert r1["text_identity_ok"] is True
    assert r1["enrich"]["pending"] > 0 and r1["join"]["pending"] > 0
    assert r1["poly_stats_rows"] > 0

    # second run: every partition committed -> no-op resume
    r2 = _submit(zip_path, out)
    assert r2["enrich"] == {"pending": 0, "done_before": r1["enrich"]["pending"]}
    assert r2["join"]["pending"] == 0
    assert r2["poly_stats_rows"] == r1["poly_stats_rows"]


def _submit_crawl(pyfiles: str, output: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", pyfiles,
        os.path.join(REPO, "jobs", "crawl_ingest_job.py"),
        "--output", output,
        "--parts", "16",
        "--split-bytes", "16384",
    ]
    env = {**os.environ}
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env, cwd=REPO
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


def test_crawl_ingest_job_builds_input_hint_table_and_resumes(tmp_path):
    """WARC shards -> snapshot table in the EXACT input_hint schema
    (url, warc_ts, html, text, lang), byte-identity audited, no-op on
    re-run — the upstream stage of the north-star pipeline."""
    zip_path = subprocess.check_output(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        text=True, cwd=REPO,
    ).strip()

    out = str(tmp_path / "crawl_out")
    r1 = _submit_crawl(zip_path, out)
    assert r1["text_identity_ok"] is True
    assert r1["pages_rows"] == 600
    assert sorted(r1["schema"]) == sorted(
        ["url", "warc_ts", "html", "text", "lang"]
    )
    assert r1["ingest"]["pending"] > 0

    r2 = _submit_crawl(zip_path, out)
    assert r2["ingest"] == {"pending": 0, "done_before": r1["ingest"]["pending"]}
    assert r2["pages_rows"] == 600
