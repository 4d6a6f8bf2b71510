"""The bench parity gate is HARD: greedy divergence vs the NumPy oracle must
kill the run with no JSON line (CLAUDE.md invariant; VERDICT r1 weak #1).

Subprocess-runs the real bench.py on the CPU backend (BENCH_DECODE_TOKENS
keeps the timed scan short).
"""

import json
import os
import subprocess

import pytest
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "BENCH_DECODE_TOKENS": "16", **extra_env}
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=900)


@pytest.mark.slow  # full bench subprocess (~70s); the driver runs the
# real gate on TPU every round, and the corrupt-weights gate test below
# keeps the parity-gate logic in the fast lane
def test_bench_emits_one_json_line():
    r = _run({})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "tokens/s" and rec["value"] > 0
    assert "greedy parity OK" in r.stderr


def test_bench_gate_fails_on_corrupt_weights():
    r = _run({"BENCH_CORRUPT": "1"})
    assert r.returncode != 0
    assert r.stdout.strip() == ""  # no JSON line published
    assert "FATAL greedy divergence" in r.stderr
