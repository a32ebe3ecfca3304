"""The bench harness is the driver's round-over-round signal — a broken
bench.py means BENCH_r{N}.json goes null and rounds stop being
comparable (it happened in r1). This smoke test runs the real script as
a subprocess on a 3-query subset at the smallest scale factor and
asserts the output contract: a durable JSON file AND a final parseable
stdout line with the expected shape."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_smoke(tmp_path):
    out_file = tmp_path / "bench_smoke.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_ONLY="flagship_runs_listing,pricing_summary,exact_dedup_kept",
        SPARK_GRAFT_BENCH_OUT=str(out_file),
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # durable file carries the full per-query map
    file_out = json.loads(out_file.read_text())
    assert set(file_out["queries"]) == {
        "flagship_runs_listing",
        "pricing_summary",
        "exact_dedup_kept",
    }
    # stdout contract (r11, VERDICT r10 item 1): the LAST line is ONE
    # parseable JSON object CARRYING the per-query map — the driver
    # ingests only this line (PERF_r09/r10 had per_query:{} because the
    # map lived only in bench_out.json). Printed after spark.stop(), so
    # nothing may follow it.
    stdout_lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    line_out = json.loads(stdout_lines[-1])
    assert line_out["queries"] == file_out["queries"]

    for out in (file_out, line_out):
        assert out["unit"] == "sec"
        assert out["value"] > 0
        assert out["sf"] == 0.001
    assert line_out["value"] == file_out["value"]
