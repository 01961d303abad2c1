"""bench.py CLI robustness: the driver parses exactly one JSON line from it,
so every failure mode must still print one.  The reference has no analogue
(its engine just hangs with the cluster); this covers the relay-outage modes
we have actually hit: backend-init hang (_require_device) and the
init-ok-but-first-compile-stalled hang (_arm_total_watchdog, observed
2026-08-19)."""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_watchdog_emits_parseable_zero_result():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_TOTAL_TIMEOUT"] = "2"  # fires during setup/compile
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--config", "atto56"],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO)
    assert proc.returncode == 4, proc.stderr[-500:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "stalled" in out["error"]
    assert out["metric"] == "mpmae_atto_mmearth64_pretrain_samples_per_sec_per_chip"
