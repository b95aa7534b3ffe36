"""Multi-HOST execution tests: real 2-process jax.distributed runs on CPU.

The reference's multi-process story is torch.distributed.launch + NCCL with
padded all_gather eval collection (ContextPose/train.py:216-226,240-249).
Ours is jax.distributed + GSPMD + parallel/distributed.{put_batch,
local_rows,allgather_hosts}. These tests spawn REAL processes (gloo CPU
collectives, localhost coordinator) — the only way to exercise
non-addressable global arrays.

Marked slow: each worker pays its own jit compiles on one shared core.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(args: list[str], port: int, pid: int, n: int,
           devices: int = 2, extra: list[str] | None = None):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    env.pop("JAX_PLATFORMS", None)
    env["CAPF_MP_TEST"] = "1"
    return subprocess.Popen(
        [sys.executable, *args, str(pid), str(n), str(port),
         *(extra or [])],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )


def _run_all(workers, timeout=900):
    outs = []
    for p in workers:
        try:
            outs.append(p.communicate(timeout=timeout)[0])
        except subprocess.TimeoutExpired:
            for q in workers:
                q.kill()
            raise
    for i, (p, out) in enumerate(zip(workers, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out[-4000:]}"
    return outs


def test_graft_entry_mp_worker():
    """The __graft_entry__ dryrun worker: sharded train step + eval gather
    across 2 processes x 2 devices."""
    port = _free_port()
    workers = [
        _spawn([os.path.join(REPO, "__graft_entry__.py"), "mp_worker"],
               port, i, 2)
        for i in range(2)
    ]
    outs = _run_all(workers)
    for i, out in enumerate(outs):
        assert f"mp_worker {i} OK" in out, out[-2000:]


def test_graft_entry_mp_worker_4process():
    """dp=4 across FOUR processes (1 device each): the gather/trim and
    grad-allreduce paths at a world size the 2-process test can't hit."""
    port = _free_port()
    workers = [
        _spawn([os.path.join(REPO, "__graft_entry__.py"), "mp_worker"],
               port, i, 4, devices=1)
        for i in range(4)
    ]
    outs = _run_all(workers, timeout=1500)
    for i, out in enumerate(outs):
        assert f"mp_worker {i} OK" in out, out[-2000:]


def test_graft_entry_mp_worker_tp2_across_hosts():
    """Tensor-parallel collectives CROSSING the process (host) boundary:
    2 processes x 2 devices, mesh model axis laid across processes — the
    Megatron lifter psum/allgathers ride the inter-process (DCN-analog)
    path the dp-only tests never exercise. Both processes must compute the
    identical loss on the identical global batch."""
    port = _free_port()
    workers = [
        _spawn([os.path.join(REPO, "__graft_entry__.py"), "mp_worker"],
               port, i, 2, devices=2, extra=["2"])
        for i in range(2)
    ]
    outs = _run_all(workers)
    losses = []
    for i, out in enumerate(outs):
        assert f"mp_worker {i} OK" in out, out[-2000:]
        assert "tp=2 across hosts" in out, out[-2000:]
        line = [l for l in out.splitlines() if f"mp_worker {i} OK" in l][0]
        losses.append(float(line.rsplit("loss=", 1)[1]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-9), losses


def test_trainer_multiprocess_eval_consistency():
    """Full Trainer loop across 2 processes: per-process dataset shards,
    put_batch global batches, allgather'd eval — both processes must compute
    the IDENTICAL p1 (they see the same gathered global results)."""
    port = _free_port()
    workers = [
        _spawn([os.path.join(REPO, "tests", "mp_trainer_worker.py")],
               port, i, 2)
        for i in range(2)
    ]
    outs = _run_all(workers)
    vals = []
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("P1RESULT ")]
        assert lines, f"worker {i} printed no P1RESULT:\n{out[-2000:]}"
        vals.append(float(lines[-1].split()[1]))
    assert vals[0] == pytest.approx(vals[1], abs=1e-9), vals
