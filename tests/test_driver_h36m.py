"""End-to-end driver test: synthetic data, tiny model, real CLI entry."""

import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow


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


def test_eval_with_serve_deploy_preset(tmp_path):
    """--eval with a *_deploy preset (quantize="serve"): the Trainer
    calibrates lazily on the first evaluate() call and the eval runs int8
    layer1 end to end; train-step construction with a serve config raises."""
    import dataclasses

    import pytest as _pytest

    from contextaware_poseformer_tpu.train import train_h36m

    logdir = str(tmp_path / "run")
    args = [
        "--preset", "h36m_hrnet_32_deploy", "--synthetic", "--tiny",
        "--batch-size", "16", "--eval-batches", "1", "--logdir", logdir,
    ]
    summary = train_h36m.main(args + ["--eval"])
    assert set(summary) == {"p1_mm", "p2_mm", "mpjve_mm"}
    assert np.isfinite(summary["p1_mm"])

    # serve mode is inference-only: training with it must fail loudly
    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.train import steps

    cfg = train_h36m.make_config(train_h36m.build_argparser().parse_args(args))
    assert cfg.model.backbone.quantize == "serve"
    with _pytest.raises(ValueError, match="inference-only"):
        steps.make_train_step(None, cfg, None)
