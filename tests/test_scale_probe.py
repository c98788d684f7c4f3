"""Smoke test for tools/scale_probe.py — keeps the scaling-evidence tool
(PLANS.md "Scaling linearity") from bit-rotting against registry or loader
changes. Runs the full build→time→summarize path at sf0.001 with a 2×
multiplier and two cheap queries in a subprocess (own Spark session, so the
probe's env-var wiring is exercised exactly as documented)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_probe_smoke(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SCALE_BASE="/root/testdata/sf0.001",
        SPARK_GRAFT_SCALE_SCRATCH=str(tmp_path / "scratch"),
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scale_probe.py"),
            "--mults",
            "1,2",
            "--queries",
            "a10_q1_filter_count,c1_dedup_exact_docs",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # Spark progress bars interleave \r into stdout — split on both
    lines = [
        ln
        for chunk in proc.stdout.splitlines()
        for ln in chunk.split("\r")
        if ln.startswith("{")
    ]
    records = [json.loads(ln) for ln in lines]
    timed = [r for r in records if "query" in r]
    assert {r["query"] for r in timed} == {"a10_q1_filter_count", "c1_dedup_exact_docs"}
    assert all(r["sec"] > 0 for r in timed)
    assert all("plan" in r for r in timed), "plan fingerprint missing"
    # plan fingerprints must be scale-stable even at this toy multiplier
    by_q: dict[str, set] = {}
    for r in timed:
        by_q.setdefault(r["query"], set()).add(json.dumps(r["plan"], sort_keys=True))
    assert all(len(shapes) == 1 for shapes in by_q.values()), by_q
    summary = [r for r in records if "summary" in r]
    assert len(summary) == 1
    assert "ratio_vs_linear" in summary[0]["summary"]["a10_q1_filter_count"]
    # scratch cleaned without --keep
    assert not os.path.exists(str(tmp_path / "scratch"))
