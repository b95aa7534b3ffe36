from contextaware_poseformer_tpu.models.lifter import PoseLifter  # noqa: F401
