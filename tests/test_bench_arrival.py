"""scripts/bench_arrival.py is the decision artifact behind the
small-batch serving note (docs/benchmarks.md "Arrival-rate curves"): it
must run hermetically on CPU, sweep both serving modes open-loop, and
write the contracted curve fields."""

import json
import os
import subprocess
import sys
from pathlib import Path


def test_arrival_bench_emits_curves(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "curves.json"
    env = dict(os.environ, BENCH_DOCS="2000", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, str(repo / "scripts" / "bench_arrival.py"),
            "--duration", "0.6", "--fractions", "0.5,1.5",
            "--request-b", "16", "--max-batch", "64",
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    doc = json.loads(out.read_text())
    assert doc["backend"] == "cpu"
    assert doc["direct_capacity_rps"] > 0
    assert doc["coalesced_capacity_rps"] > 0
    for mode in ("direct", "coalesced"):
        pts = doc["curves"][mode]
        assert [p["fraction_of_direct_cap"] for p in pts] == [0.5, 1.5]
        for p in pts:
            assert p["completed"] > 0, (mode, p)
            assert p["errors"] == [], (mode, p)
            assert p["p50_ms"] <= p["p95_ms"] <= p["p99_ms"]
            # open loop: achieved can never exceed offered by more than
            # sampling noise on a short window
            assert p["achieved_rps"] <= p["offered_rps"] * 1.5 + 5
    # markdown rows on stdout, one per sweep point
    rows = [ln for ln in res.stdout.splitlines() if ln.startswith("| ")]
    assert len(rows) >= 3  # header + separator is not "| " prefixed? keep >= points
