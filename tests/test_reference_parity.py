"""Direct parity against the ACTUAL reference modules (skipped when
/root/reference is absent). The definitive per-joint float-tolerance check:
same randomly-initialized weights, reference PyTorch code vs ours."""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not mounted"
)

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
