"""The driver-graded bench harness end-to-end on a tiny CPU config.

bench.py is a graded gate (BENCH_rN.json); this pins its host logic —
candidate A/B, staged uploads, window accounting, breakdown keys, JSON
shape — against a tiny config so a refactor cannot silently break the
measurement (the numbers themselves are only meaningful on hardware).
"""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compiles tiny SLAM programs (~2-4 min)


def test_bench_tiny_cpu(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        "PATCHES_PER_FRAME: 8\nREMOVAL_WINDOW: 6\nOPTIMIZATION_WINDOW: 4\n"
        "PATCH_LIFETIME: 3\nKEYFRAME_INDEX: 2\nKEYFRAME_THRESH: 12.5\n"
        "MEM: 12\nGRADIENT_BIAS: false\nPALLAS_CORR: false\n")
    p = subprocess.run(
        [sys.executable, "bench.py", "--config", str(cfg),
         "--size", "96", "128",
         "--warmup", "12", "--timed", "8", "--trials", "2",
         "--buffer", "64", "--candidates", "1:0,2:0"],
        capture_output=True, text=True, timeout=1500,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin",
             "PYTHONPATH": "/root/.axon_site", "HOME": "/root"})
    assert p.returncode == 0, p.stderr[-2000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["metric"].startswith("vo_fps_")
    assert out["value"] > 0
    assert set(out["candidates"]) == {"chunk1_fused0", "chunk2_fused0"}
    assert out["chosen"] in out["candidates"]
    assert out["device_ms_per_frame"] is None or \
        out["device_ms_per_frame"] > 0
    assert "loop_ms_per_frame" in out and "overhead_ms_per_frame" in out
