"""Context-Aware PoseFormer, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
QitaoZhao/ContextAware-PoseFormer ("A Single 2D Pose with Context is Worth
Hundreds for 3D Human Pose Estimation", NeurIPS 2023): a frozen COCO 2D-pose
backbone (HRNet-32/48 or CPN) produces multi-scale feature maps, 2D keypoints
index into them via bilinear sampling + learned deformable offsets to build
per-joint context tokens, and a small transformer lifts 17 joint tokens to
root-relative 3D.

Everything here is TPU-first: NHWC layouts, XLA convolutions, fused sampling
kernels (Pallas), `jax.sharding.Mesh` data parallelism, functional parameter
pytrees, static shapes throughout.
"""

__version__ = "0.1.0"

from contextaware_poseformer_tpu import config as config  # noqa: F401
