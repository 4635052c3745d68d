"""bench.py must be timeout-proof (VERDICT r4 #1).

Round 4's official record was void: the driver killed bench.py before its
single end-of-run JSON emission (BENCH_r04.json rc=124, parsed null).
bench.py now emits the headline JSON line right after the headline config,
rewrites BENCH_DETAIL.json incrementally, and skips remaining configs
gracefully under a wall-clock budget. This runs the real bench.py as a
subprocess on CPU (BENCH_SMOKE shapes) with an artificially tight budget
and asserts the record survives.
"""
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_bench_budget_emits_headline_and_detail(tmp_path):
    env = dict(os.environ)
    env.update(
        BENCH_ALLOW_CPU="1",
        BENCH_SMOKE="1",
        BENCH_BUDGET_S="1",  # exhausted after the headline config
        BENCH_DETAIL_PATH=str(tmp_path / "detail.json"),
        TTS_ARABIC_GATE_CACHE=str(tmp_path / "gate_cache"),
        JAX_PLATFORMS="cpu",
    )
    p = subprocess.run([sys.executable, str(ROOT / "bench.py")], env=env,
                       capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, p.stderr[-2000:]

    lines = [l for l in p.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON on stdout: {p.stdout!r}"
    # the FIRST emission happened right after the headline config — an
    # external kill any time after that can no longer void the record
    first = json.loads(lines[0])
    assert first["metric"] == "rtf_fastpitch_hifigan_e2e"
    assert first["value"] > 0
    assert first["compute_only_rtf"] > 0
    # the LAST emission records what was skipped under the budget
    rec = json.loads(lines[-1])
    assert rec["value"] > 0
    assert "tacotron2" in rec["skipped"]
    assert "headline_window2" in rec["skipped"]

    detail = json.loads((tmp_path / "detail.json").read_text())
    assert detail["rtf_headline_reported"] > 0
    assert detail["skipped"]
    assert detail["warmup_s"]["e2e"] > 0
    assert detail["compute_only_rtf"] > 0
    assert detail["provenance"]["platform"] == "cpu"
