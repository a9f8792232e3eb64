"""Driver-contract smoke test for bench.py (VERDICT r3 item 2c).

Round 3's official bench artifact was lost because the extras OOMed the
chip and poisoned the stdout stream the driver parses.  This runs the REAL
bench entrypoint end-to-end at tiny CPU shapes and asserts the contract:
stdout is exactly one parseable JSON line with the headline metric, and
BENCH_LOCAL.json carries headline + extras.  Nothing benchable ships unrun
again.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_contract_tiny(tmp_path):
    local = tmp_path / "BENCH_LOCAL.json"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_LOCAL_PATH": str(local),
        # tiny everything: the point is executing every code path, not perf
        "BENCH_BATCH": "8", "BENCH_PILOT": "8", "BENCH_REPS": "1",
        "BENCH_DISPATCH": "8", "BENCH_CHUNK_STEPS": "32",
        "BENCH_MAP_RES": "0.25", "BENCH_FRONTIER": "64",
        "BENCH_FRONTEND_BATCH": "2", "BENCH_PIPELINE_BATCH": "2",
        "BENCH_TRACK_STEPS": "40", "BENCH_MPC_BATCH": "2",
        "BENCH_MPC_STEPS": "16", "BENCH_CONTROL_BATCH": "8",
        "BENCH_REPLAN_REPS": "2", "BENCH_REPLAN_B64_REPS": "2",
        "BENCH_COLD_BATCH": "8",
        "BENCH_CHILD_TIMEOUT": "600",
    })
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env, timeout=800)
    assert r.returncode == 0, r.stderr[-2000:]

    # THE driver contract: every stdout line is the headline JSON, and the
    # LAST parseable line is the headline (round-5 hardening: the headline
    # is re-emitted after the extras so a driver that takes the last JSON
    # line can never pick up an extra metric instead)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, "stdout must contain the headline"
    parsed = [json.loads(ln) for ln in lines]
    headline = parsed[-1]
    assert all(p == headline for p in parsed), parsed
    assert headline["metric"] == "minco_alm_solves_per_sec_per_chip_hill"
    assert headline["unit"] == "solves/s"
    assert "error" not in headline, headline
    assert headline["value"] > 0
    assert headline["converged_pct"] > 50.0  # tiny batch still solvable

    blob = json.loads(local.read_text())
    assert blob["headline"] == headline
    got = {m["metric"] for m in blob["extra"]}
    assert "frontend_plans_per_sec_per_chip_hill" in got
    assert "plan_track_scenarios_per_sec_per_chip_hill" in got
    assert "mpc_ticks_per_sec_per_chip_fig8" in got
    assert "replan_latency_ms_p50" in got
    assert "cold_solves_per_sec_per_chip_hill" in got
    assert "control_r03cfg_solves_per_sec_per_chip_hill" in got
    for m in blob["extra"]:
        assert m["value"] > 0, m
