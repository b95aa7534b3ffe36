"""End-to-end driver test: synthetic data, tiny model, real CLI entry."""

import json
import os

import numpy as np
import pytest


def test_smoke_train_resume_eval(tmp_path):
    from contextaware_poseformer_tpu.train import train_h36m

    logdir = str(tmp_path / "run")
    args = [
        "--synthetic", "--tiny", "--batch-size", "16",
        "--steps-per-epoch", "4", "--eval-batches", "1",
        "--logdir", logdir,
    ]
    best = train_h36m.main(args + ["--epochs", "1"])
    assert np.isfinite(best)

    # metrics written
    lines = open(os.path.join(logdir, "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0]["epoch"] == 0 and np.isfinite(recs[0]["train_loss"])

    # checkpoint exists and resume continues at epoch 1
    best2 = train_h36m.main(args + ["--epochs", "2", "--resume"])
    recs = [json.loads(l) for l in
            open(os.path.join(logdir, "metrics.jsonl")).read().splitlines()]
    assert [r["epoch"] for r in recs] == [0, 1]

    # eval-only path returns the summary dict
    summary = train_h36m.main(args + ["--eval", "--resume"])
    assert set(summary) == {"p1_mm", "p2_mm", "mpjve_mm"}


def test_synthetic_learnability_sanity():
    """The synthetic task is learnable: short training must beat the
    untrained model by a wide margin (pipeline-wiring oracle)."""
    from contextaware_poseformer_tpu.train import train_h36m

    args = [
        "--synthetic", "--tiny", "--batch-size", "32",
        "--steps-per-epoch", "100", "--eval-batches", "2",
        "--logdir", "",
    ]
    # untrained eval baseline: random-init lifter
    base = train_h36m.main(args + ["--eval"])
    best = train_h36m.main(args + ["--epochs", "3"])
    assert best < base["p1_mm"] * 0.6, (best, base)
