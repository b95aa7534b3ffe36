from contextaware_poseformer_tpu.parallel import distributed  # noqa: F401
from contextaware_poseformer_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
