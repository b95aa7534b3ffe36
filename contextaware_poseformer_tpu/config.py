"""Typed configuration tree.

The reference uses a mutable module-global easydict + YAML overlay + imperative
CLI mutation (ContextPose/mvn/utils/cfg.py:5-181, train.py:266-277,
ContextPose_mpi/run_3dhp.py:219-235). Here the same surface is a frozen
dataclass tree with backbone presets expressed as data, plus an optional YAML
overlay for experiment files.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, replace
from typing import Any, Mapping, Sequence


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HRNetStageConfig:
    """One HRNet stage (reference: ContextPose/mvn/utils/cfg.py:43-66)."""

    num_modules: int
    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    block: str = "BASIC"  # "BASIC" | "BOTTLENECK"


@dataclass(frozen=True)
class BackboneConfig:
    """2D-pose backbone producing 4 multi-scale feature maps.

    kind: "hrnet" (pose_hrnet.py) or "cpn" (networks/network.py).
    For HRNet the returned levels have `feature_dims = (C, 2C, 4C, 8C)` at
    resolutions (64x48, 32x24, 16x12, 8x6); for CPN all four refine maps are
    256ch @ 64x48 (reference conpose.py:16-20, pose_dformer.py:177-180).
    """

    kind: str = "hrnet"
    width: int = 32  # HRNet base channels C (32|48); unused for CPN
    num_joints: int = 17
    frozen: bool = True  # reference: fix_weights=True (human36m.yaml:21)
    # "c128": int8 dynamic-quant convs where both channel counts >= 128
    # (deploy-only; measured 1.85x on those shapes, see PERF.md);
    # "serve": c128 plus end-to-end int8 layer1 (static calibrated scales,
    # 1.90x on the HBM-bound bottleneck chain — needs calibrate_quantization);
    # "static": per-conv static-scale int8 on 3x3 convs >= 16ch (measured
    # neutral on the flagship graph; kept for other topologies)
    quantize: str = "none"
    # activation-scale calibration statistic: 1.0 = exact max|x| (classic
    # max-amax); q < 1 = per-batch q-quantile of |x| (histogram estimate,
    # running max across batches) — clips the outlier tail so the int8 grid
    # spends its 255 steps on the bulk of the distribution. Only read during
    # calibrate_quantization passes; the inference graph is unchanged.
    calib_quantile: float = 1.0
    # quantize="serve" only: calibrated STATIC amax for the wide-conv int8
    # path instead of a runtime max|x| reduce per conv (see
    # backbone_common.ConvBN.serve_static_amax). Accuracy impact measured
    # via tools/deploy_numerics.py before enabling per preset.
    serve_static_amax: bool = False
    # layer1 implementation under quantize="serve": "xla" = the e2e-int8
    # XLA graph; "pallas" = the fused 4-block VMEM-resident chain kernel
    # (ops/layer1_chain.py) — same quantized arithmetic, HBM touched only
    # at the chain ends. Ignored unless quantize == "serve". Measured
    # SLOWER than "xla" on v5e (PERF.md round-2 session 3: the int8
    # matmul floor at these K=64/N=64 shapes is 2.35 ms vs XLA's 2.25 ms
    # full chain) — kept as an opt-in negative-result artifact.
    layer1_impl: str = "xla"
    # CPN only: skip the refineNet output upsamples and hand the lifter the
    # native-resolution pyramid (/32../4) instead of four /4 maps
    # (refineNet.py:72-88 materializes all levels at /4 before sampling).
    # Bilinear-sampling an align-corners-upsampled map with border padding
    # equals sampling the native map at the same NORMALIZED coordinates
    # except inside fine cells that straddle a coarse-grid crease (the /4
    # grid is not an integer refinement of /8 and /16 under align_corners:
    # 63/31 and 63/15 are non-integer), where the upsampled surface is
    # chord-smoothed. The deviation is a measured-accuracy deployment
    # trade (tools/deploy_numerics.py), like calib_quantile — NOT bit
    # parity; default False keeps the reference graph. Perf: removes 3
    # upsample matmul chains and ~4x/16x/64x of per-level sampler HBM
    # traffic (PERF.md CPN budget).
    cpn_native_pyramid: bool = False
    # CPN only, quantize="serve": END-TO-END int8 tensor stream through the
    # ResNet bottleneck stages and the refineNet cascades — the proven
    # layer1 recipe (models/hrnet.py _layer1_int8, 1.90x on that chain)
    # generalized. Inter-block tensors stay int8 in HBM with static
    # calibrated scales ("calib" collection, observed during the standard
    # serve calibration pass), residual adds dequantize in-register, and
    # each block output requantizes inside the producing conv's fusion —
    # so the float tensor between blocks never exists in HBM and the
    # per-conv input-quantize passes disappear (clamp_convert was 3.2 ms
    # and add_maximum 1.3 ms of CPN's 15.4 ms deploy budget, round-4
    # trace). Extra quantization points vs per-conv serve mode make this
    # an accuracy-gated deploy trade (tools/deploy_numerics.py --cpn-only
    # protocol), like cpn_native_pyramid. Ignored unless kind == "cpn"
    # and quantize == "serve".
    cpn_int8_stream: bool = False
    # CPN only, on top of cpn_int8_stream + cpn_native_pyramid: hand the
    # LIFTER int8 pyramid maps instead of bf16 — the backbone requantizes
    # each refine output with a calibrated per-level scale and returns
    # (maps_s8, dequant_scales). Bilinear sampling is channel-linear, so
    # the scale folds into the in-kernel embed_proj weights (deformable
    # path) / multiplies the 17-point reference samples (tiny) — no
    # dequantize pass over the maps ever runs. Halves the dominant
    # sampler HBM traffic: the /4-level 256-ch map (201 MB bf16 at batch
    # 128) is written once, relayout-copied once, and read by FOUR
    # deformable blocks per step (~1.4 GB/step of the 9.3 GB total, all
    # measured DMA-bound — PERF.md round-4 CPN page). Accuracy-gated like
    # every deploy trade (tools/deploy_numerics.py --cpn-only). Ignored
    # unless cpn_int8_stream and cpn_native_pyramid are both on.
    cpn_int8_maps: bool = False
    # CPN only, quantize="serve": fold the image normalization into the
    # stem conv and feed the model RAW uint8 BGR frames. The model bitcasts
    # u8^0x80 to s8 (= u8-128, exact), flips BGR->RGB, and runs conv1 as an
    # s8 x int8-weight conv with the 1/255 dequant scale folded into the BN
    # affine; the constant normalization offset (128/255 - mean) becomes a
    # border-aware bias map (conv of the constant image under zero padding
    # — exact, including edges; see models/cpn.py). Removes the u8->bf16
    # normalize convert + relayout of the full-res image (copy.522,
    # ~174 us/iter at batch 128 — round-4b trace) and shrinks the input
    # HBM write 2x (s8 vs bf16). The ONLY approximation is the stem
    # weight int8 rounding (per-output-channel scales); accuracy-gated via
    # tools/deploy_numerics.py like every serve trade. When on, serving
    # callers pass raw u8 via augment.serving_images; float inputs still
    # take the standard path (dtype dispatch), so parity/training are
    # unaffected. Ignored unless kind == "cpn" and quantize == "serve".
    cpn_fold_normalize: bool = False
    # CPN only, on top of cpn_int8_stream: carry the globalNet TOP-DOWN
    # stream's READ side as s8 with calibrated static per-hop scales.
    # The up-conv requantizes in its epilogue (fuses — the int8-stream
    # mechanism), the separable bilinear resize dots read s8 and blend
    # the integer values in bf16 (align-corners weights are convex, so
    # values stay in [-127,127] exactly), and the single scalar dequant
    # multiply fuses into the consumer's lateral add. The blend OUTPUT
    # stays bf16 ON PURPOSE: the full-s8 variant (post-blend requant,
    # halving the write side too) measured -3.60% device — XLA refuses
    # the round/clip/convert epilogue on the col-interp dot and emits
    # ~603us/iter of standalone clamp_convert passes over the largest
    # tensors (PERF.md round-5 page). MUSEUM KNOB — this read-side-only
    # variant measured WASH on device (-0.13%; the full-s8 trace's
    # apparent dot-bucket win was the output write moving into the
    # standalone clamp pass), so it is NOT in config.deploy. Kept with
    # its trained accuracy gate (+0.060 mm full-s8 variant,
    # deploy_numerics --cpn-only) for other shape regimes. Ignored
    # unless kind == "cpn", quantize == "serve", and cpn_int8_stream.
    cpn_int8_topdown: bool = False
    # HRNet only: run stage4 with ONLY its first module (drop modules 1-2,
    # ~2/3 of stage-4 branch compute + 2 fuse sets). Levels 1-3 are ALREADY
    # the first stage-4 module's pre-fuse branch outputs (the reference's
    # in-place-mutation quirk, pose_hrnet.py:289-290,501), so only level0
    # changes: it becomes module 0's fused output instead of module 2's.
    # An accuracy-gated deployment trade like cpn_native_pyramid — measured
    # via the trained-P1 protocol (tools/deploy_numerics.py --truncate)
    # before shipping per preset; default False keeps the reference graph.
    hrnet_stage4_truncate: bool = False
    # CPN ResNet stage depths (torchvision resnet50 = (3, 4, 6, 3)); only
    # shrunk by tests/accuracy probes — checkpoints require the default.
    cpn_layers: tuple[int, ...] = (3, 4, 6, 3)
    stage2: HRNetStageConfig = HRNetStageConfig(1, 2, (4, 4), (32, 64))
    stage3: HRNetStageConfig = HRNetStageConfig(4, 3, (4, 4, 4), (32, 64, 128))
    stage4: HRNetStageConfig = HRNetStageConfig(
        3, 4, (4, 4, 4, 4), (32, 64, 128, 256)
    )

    @property
    def feature_dims(self) -> tuple[int, ...]:
        if self.kind == "cpn":
            return (256, 256, 256, 256)
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    @property
    def feature_strides(self) -> tuple[int, ...]:
        if self.kind == "cpn":
            if self.cpn_native_pyramid:
                return (32, 16, 8, 4)  # deepest first (refine_fms order)
            return (4, 4, 4, 4)
        return (4, 8, 16, 32)


def _hrnet_stages(width: int) -> dict[str, HRNetStageConfig]:
    c = (width, 2 * width, 4 * width, 8 * width)
    return dict(
        stage2=HRNetStageConfig(1, 2, (4, 4), c[:2]),
        stage3=HRNetStageConfig(4, 3, (4, 4, 4), c[:3]),
        stage4=HRNetStageConfig(3, 4, (4, 4, 4, 4), c),
    )


# ---------------------------------------------------------------------------
# Lifting network
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LifterConfig:
    """PoseTransformer lifting net (reference pose_dformer.py:144-208).

    `embed_dim_ratio` is the per-level token dim; the joint-token dim is
    `embed_dim_ratio * (levels + 1)`. `use_deformable=False` selects the
    MPI-INF-3DHP variant which skips the deformable context blocks
    (ContextPose_mpi/model/pose_dformer.py:174-261).
    """

    num_joints: int = 17
    in_chans: int = 2
    embed_dim_ratio: int = 128
    levels: int = 4
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    use_deformable: bool = True
    deform_heads: int = 4  # reference pose_dformer.py:202
    deform_samples: int = 4
    # feature-sampling implementation: "gather" (jnp), "fused" (Pallas),
    # "auto" (fused on TPU, gather elsewhere)
    sampler: str = "auto"
    # MXU precision inside the fused sampler: "highest" (fp32 passes, exact
    # parity with the gather formulation) or "default" (bf16 passes — the
    # right deployment mode when the backbone already computes in bf16)
    sampler_precision: str = "highest"
    # lifter compute dtype ("float32" for parity/training; "bfloat16" for
    # deployment). Params, LayerNorms, softmax, and the output head always
    # stay float32.
    compute_dtype: str = "float32"
    # LayerNorm statistics dtype for the transformer blocks ("float32" for
    # parity; "bfloat16" shaves the convert+reduce passes in deployment).
    # The output head_norm ALWAYS stays float32.
    ln_dtype: str = "float32"
    # res-block (level-axis, 5-token) attention implementation: "einsum"
    # (XLA, parity default) or "fused" (Pallas short-sequence kernel,
    # measured 9.8x — ops/small_attention.py). Joint blocks (17 tokens,
    # dim 640) always use einsum: the pairwise fused form scales O(N^2)
    # in instructions and loses there.
    attention: str = "einsum"
    # joint-block (17-token, dim 640) attention: "einsum" (parity default)
    # or "grouped" (Pallas head-batched scores/softmax/AV middle,
    # ops/joint_attention.py; qkv/proj stay XLA). Separate from `attention`
    # because the res-block pairwise kernel loses at N=17.
    attention_joint: str = "einsum"
    # block MLP implementation: "einsum" (XLA LayerNorm + Mlp, parity
    # default) or "fused" (single Pallas LN+MLP+residual kernel,
    # ops/fused_mlp.py — no HBM round trip between fc1/fc2, LN statistics
    # on the VPU). Applies to context/res/joint blocks; inference-oriented
    # (needs inactive dropout/drop-path).
    mlp: str = "einsum"
    # DeformableBlock project-then-sample: run each level's embed_proj on
    # the feature map BEFORE the sampler when C_l > head_dim — identical
    # math (bilinear sampling is channel-linear; border weights sum to 1),
    # C_l/head_dim less sampler matmul work. Deploy-mode switch; the
    # reference order is kept for parity/training.
    sampler_pre_project: bool = False

    @property
    def embed_dim(self) -> int:
        return self.embed_dim_ratio * (self.levels + 1)


# ---------------------------------------------------------------------------
# Model / data / training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    backbone: BackboneConfig = BackboneConfig()
    lifter: LifterConfig = LifterConfig()
    # (height, width) of the cropped input frame; reference uses 256x192
    # everywhere (cfg.py:19 image_shape [192,256] stored as [W,H]).
    image_shape: tuple[int, int] = (256, 192)
    # compute dtype for the backbone ("bfloat16" on TPU; "float32" for parity)
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "human36m"  # "human36m" | "mpi_inf_3dhp"
    root: str = "data/h36m/images"
    train_labels_path: str = "data/h36m/h36m_train.pkl"
    val_labels_path: str = "data/h36m/h36m_validation.pkl"
    # 3DHP npz paths (ContextPose_mpi/common/load_data_3dhp_mae.py)
    train_npz: str = "data/3dhp/data_train_3dhp.npz"
    test_npz: str = "data/3dhp/data_test_3dhp.npz"
    num_prefetch: int = 2
    num_workers: int = 8
    # packed raw-frame stores (data/frame_store.py, built with
    # tools/build_frame_store.py): zero-decode host loading; "" = off
    train_frame_store: str = ""
    val_frame_store: str = ""


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 512
    lr: float = 6.4e-4  # human36m.yaml:57 (HRNet); 3.2e-4 for CPN
    lr_decay: float = 0.99  # exponential per-epoch (train.py:410-412)
    weight_decay: float = 0.1  # AdamW (train.py:345)
    n_epochs: int = 60
    flip_aug: bool = True  # random horizontal flip (datasets/utils.py:55-65)
    # occlusion augmentation: erase squares around random joints
    # (config.train.erase + img.py:179-198; off by default like the reference)
    erase_aug: bool = False
    erase_size: int = 70
    erase_joints: int = 2
    flip_test: bool = True  # test-time flip averaging (train.py:170-181)
    seed: int = 0
    loss: str = "MPJPE"
    grad_clip: float = 0.0
    # 3DHP-style step decay: lr *= lr_decay_large every large_decay_epoch
    large_decay_epoch: int = 0
    lr_decay_large: float = 0.5


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes. data = batch sharding (DP); model reserved for
    sharding the lifter's head/level axis if ever needed (SURVEY.md 2.6)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1


@dataclass(frozen=True)
class Config:
    name: str = "h36m_hrnet_32"
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    logdir: str = "logs"


# ---------------------------------------------------------------------------
# Presets (replacing imperative mutation at train.py:266-277 and
# run_3dhp.py:219-235)
# ---------------------------------------------------------------------------


def hrnet_backbone(width: int) -> BackboneConfig:
    return BackboneConfig(kind="hrnet", width=width, **_hrnet_stages(width))


def cpn_backbone() -> BackboneConfig:
    return BackboneConfig(kind="cpn", width=256)


def preset(name: str) -> Config:
    """Named experiment presets.

    h36m_{hrnet_32,hrnet_48,cpn}: Human3.6M training recipe (CPN-detected 2D,
    deformable context blocks on).
    mpi_3dhp_{hrnet_32,hrnet_48}: MPI-INF-3DHP recipe (GT 2D, no deformable
    blocks, root joint 14, embed_dim_ratio 64/96).
    """
    if name == "h36m_hrnet_32":
        return Config(
            name=name,
            model=ModelConfig(
                backbone=hrnet_backbone(32),
                lifter=LifterConfig(embed_dim_ratio=128),
            ),
        )
    if name == "h36m_hrnet_48":
        return Config(
            name=name,
            model=ModelConfig(
                backbone=hrnet_backbone(48),
                lifter=LifterConfig(embed_dim_ratio=128),
            ),
        )
    if name == "h36m_cpn":
        return Config(
            name=name,
            model=ModelConfig(
                backbone=cpn_backbone(),
                lifter=LifterConfig(embed_dim_ratio=128),
            ),
            train=TrainConfig(batch_size=256, lr=3.2e-4),
        )
    if name in ("mpi_3dhp_hrnet_32", "mpi_3dhp_hrnet_48"):
        width = 32 if name.endswith("32") else 48
        # run_3dhp.py:232 overrides embed_dim_ratio 64 for hrnet_32;
        # common/cfg.py:82 default 96 for hrnet_48.
        ratio = 64 if width == 32 else 96
        return Config(
            name=name,
            model=ModelConfig(
                backbone=hrnet_backbone(width),
                lifter=LifterConfig(embed_dim_ratio=ratio, use_deformable=False),
            ),
            data=DataConfig(dataset="mpi_inf_3dhp"),
            train=TrainConfig(
                batch_size=160,
                lr=7e-4,
                lr_decay=0.97,
                large_decay_epoch=80,
                lr_decay_large=0.5,
                n_epochs=60,
            ),
        )
    raise KeyError(f"unknown preset: {name!r}")


def deploy(cfg: Config) -> Config:
    """Switch a preset to deployment numerics (inference serving).

    bf16 backbone + bf16 lifter stream (params, LayerNorms, softmax, and
    the head stay fp32), single-pass bf16 MXU sampling with in-kernel
    embed_proj projection (sampler_pre_project), fused short-sequence
    attention + fused LN/MLP/residual kernels, and quantize="serve": int8
    for convs with both channel counts >= 128 plus end-to-end int8 layer1,
    calibrated at the q=0.999 activation percentile (flagship composite
    ~18.8 ms device at batch 128; PERF.md). "serve" needs a one-time
    calibration — run models.prepare_serving(model, variables,
    example_args) after loading params. Measured accuracy cost on trained
    models: P1 delta +0.036 mm for the full stack (tools/deploy_numerics
    .py). The default preset keeps full fp32 for training and
    reference-checkpoint parity.
    """
    return replace(
        cfg,
        model=replace(
            cfg.model,
            compute_dtype="bfloat16",
            # calib_quantile=0.999: histogram-percentile amax recovers ~90%
            # of the e2e-int8 accuracy delta vs max-amax calibration
            # (trained P1 +0.354 -> +0.036 mm at 64 calibration samples;
            # tools/deploy_numerics.py, PERF.md round-2 session 3)
            backbone=replace(
                cfg.model.backbone, quantize="serve", calib_quantile=0.999,
                # CPN only (no-op elsewhere): native-resolution pyramid —
                # round-3 device A/B 23.0 -> 17.9 ms/iter (1.28x composite,
                # samplers 5.8 -> 2.6 ms); trained P1 delta +0.105 mm
                # (tools/deploy_numerics.py --cpn-only), in line with the
                # other accepted deploy trades. PERF.md round-3 CPN page.
                cpn_native_pyramid=(cfg.model.backbone.kind == "cpn"),
                # CPN only: static calibrated amax for the wide int8 convs —
                # round-3 device trace 17.93 -> 15.4 ms/iter (1.16x: the
                # abs_reduce family disappears and the conv/requant fusions
                # shrink). Trained CPN protocol accuracy (deploy_numerics
                # --cpn-only): deploy +0.279 mm vs fp32, +static-amax
                # +0.044 mm — no accuracy cost. Flagship keeps dynamic amax
                # (its measured static-amax delta was +0.115 mm for a
                # smaller abs_reduce budget). PERF.md round-3.
                serve_static_amax=(cfg.model.backbone.kind == "cpn"),
                # CPN only: end-to-end int8 residual stream — between
                # bottleneck blocks only int8 tensors touch HBM (static
                # calibrated scales); skips dequantize in-register, block
                # outputs requantize in the producing conv's fusion.
                # Round-4 device A/B (tools/trace_flagship.py --preset
                # h36m_cpn [--int8-stream]): 15.40 -> 13.87 ms/iter (1.11x;
                # add_maximum 1.31 -> 0.08 ms/iter, float residual fusions
                # fold into int8 conv epilogues). Trained accuracy gate
                # (deploy_numerics --cpn-only): P1 delta -0.468 mm vs fp32
                # — no cost. PERF.md round-4 CPN page.
                cpn_int8_stream=(cfg.model.backbone.kind == "cpn"),
                # CPN only: int8 pyramid maps into the lifter sampler —
                # round-4 device A/B 13.87 -> 13.53 ms/iter (copies and
                # lifter-side fusions shrink; the sampler kernels are VPU
                # m-build bound, so the halved map reads are free but not
                # faster). Trained accuracy gate (deploy_numerics
                # --cpn-only): P1 -0.351 mm vs fp32, +0.117 vs int8-stream
                # — within the accepted deploy-trade scale. PERF.md round-4.
                cpn_int8_maps=(cfg.model.backbone.kind == "cpn"),
            ),
            lifter=replace(
                cfg.model.lifter,
                compute_dtype="bfloat16",
                sampler_precision="default",
                attention="fused",
                # round-3 device A/B (experiments/joint_attention_ab.py,
                # interleaved traces): grouped 128 vs einsum 140 us/iter,
                # rel RMS 5.6e-5 — small but free win, shipped
                attention_joint="grouped",
                mlp="fused",
                sampler_pre_project=True,
            ),
        ),
    )


def preset_or_deploy(name: str) -> Config:
    """preset(name), or deploy(preset(base)) for names ending in '_deploy'."""
    if name.endswith("_deploy"):
        return deploy(preset(name[: -len("_deploy")]))
    return preset(name)


PRESETS = (
    "h36m_hrnet_32",
    "h36m_hrnet_48",
    "h36m_cpn",
    "mpi_3dhp_hrnet_32",
    "mpi_3dhp_hrnet_48",
)


# ---------------------------------------------------------------------------
# YAML overlay (capability parity with update_config, cfg.py:166-181; unknown
# keys raise, matching the reference's update_dict contract)
# ---------------------------------------------------------------------------


def _overlay(obj: Any, updates: Mapping[str, Any]) -> Any:
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot overlay onto non-dataclass {type(obj)}")
    names = {f.name for f in dataclasses.fields(obj)}
    kwargs: dict[str, Any] = {}
    for key, value in updates.items():
        if key not in names:
            raise KeyError(f"{key!r} does not exist in {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            kwargs[key] = _overlay(current, value)
        else:
            kwargs[key] = value
    return replace(obj, **kwargs)


def load_config(path: str, base: Config | None = None) -> Config:
    """Load a YAML experiment file on top of a preset or default Config."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = base
    if cfg is None:
        cfg = preset(raw.pop("preset")) if "preset" in raw else Config()
    else:
        raw.pop("preset", None)
    return _overlay(cfg, raw)
