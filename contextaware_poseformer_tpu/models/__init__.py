from contextaware_poseformer_tpu.models.capf import (  # noqa: F401
    ContextAwarePoseFormer,
    prepare_serving,
)
from contextaware_poseformer_tpu.models.hrnet import HRNet  # noqa: F401
from contextaware_poseformer_tpu.models.lifter import PoseLifter  # noqa: F401
