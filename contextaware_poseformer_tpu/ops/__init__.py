from contextaware_poseformer_tpu.ops.grid_sample import (  # noqa: F401
    grid_sample_points,
)
