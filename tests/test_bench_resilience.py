"""bench.py capture resilience (VERDICT r3 item 8).

The round-2 bench capture died on a single transient device_put through the
tunnel (BENCH_r02.json rc=1) and produced a bare traceback instead of a JSON
line. These tests pin the two fixes without touching a TPU:

- flaky ops under `_retry` succeed after transient failures and re-raise
  after the attempt budget;
- a dead-backend simulation (monkeypatched failing `_measure`) still yields
  exactly ONE valid JSON line with an `error` field on stdout.
"""

from __future__ import annotations

import json

import pytest

import bench


def test_retry_recovers_after_transients(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("tunnel hiccup")
        return "ok"

    assert bench._retry(flaky, what="probe", attempts=3) == "ok"
    assert calls["n"] == 3


def test_retry_reraises_after_budget(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        raise ValueError("still down")

    with pytest.raises(ValueError, match="still down"):
        bench._retry(dead, what="probe", attempts=3)
    assert calls["n"] == 3


def test_killed_tunnel_still_emits_one_json_line(monkeypatch, capsys):
    def dead_measure(preset, batch):
        raise RuntimeError("device_put: tunnel closed")

    monkeypatch.setattr(bench, "_measure", dead_measure)
    with pytest.raises(SystemExit) as exc:
        bench.main(["--preset", "h36m_hrnet_32", "--batch", "8"])
    assert exc.value.code == 1
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(out_lines) == 1
    obj = json.loads(out_lines[0])
    assert obj["metric"] == "single_frame_lifts_per_sec_per_chip"
    assert obj["value"] == 0.0
    assert obj["vs_baseline"] == 0.0
    assert "tunnel closed" in obj["error"]


def test_success_json_includes_mfu(monkeypatch):
    # FLOPS.json is committed at the repo root; a successful measurement must
    # carry the roofline fields derived from it (VERDICT r3 item 1).
    gflops = bench._model_gflops("h36m_hrnet_32")
    assert gflops is not None and gflops > 1.0
    obj = bench._result_json("h36m_hrnet_32", 128, 6250.0)
    assert obj["model_gflops_per_frame"] == gflops
    assert obj["achieved_tflops"] == round(gflops * 6250.0 / 1e3, 1)
    assert 0.0 < obj["mfu"] < 1.0
    assert obj["vs_baseline"] == round(6250.0 / 2000.0, 2)
