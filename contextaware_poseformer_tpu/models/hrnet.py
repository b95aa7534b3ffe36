"""HRNet-W32/W48 backbone, NHWC, frozen-BN, multi-scale outputs.

TPU-native re-design of the reference PoseHighResolutionNet
(ContextPose/mvn/models/pose_hrnet.py:312-501; identical copy in
ContextPose_mpi/model/pose_hrnet.py). Structure:

  stem (2x stride-2 conv) -> layer1 (4x Bottleneck-64)
  -> transition1 -> stage2 (1 module, 2 branches)
  -> transition2 -> stage3 (4 modules, 3 branches)
  -> transition3 -> stage4 (3 modules, 4 branches, last module single-output)

Forward returns FOUR feature maps: the fused highest-resolution stage-4
output plus, for levels 1-3, the FIRST stage-4 module's pre-fuse branch
outputs — the reference's `x_list` at pose_hrnet.py:501 aliases them because
HRModule.forward mutates its input list in place (pose_hrnet.py:289-290).
Shapes for 256x192 input: (64,48,C), (32,24,2C), (16,12,4C), (8,6,8C).

Every torch (conv, bn) pair is one folded ConvBN module whose flax name is the
torch conv's parameter prefix, so the checkpoint converter is a string rule
(models/convert.py). The final_layer of the COCO checkpoint has no counterpart
here, matching the reference's deleted final_layer (pose_hrnet.py:362-368) and
strict=False load (train.py:292-296).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from contextaware_poseformer_tpu.config import BackboneConfig, HRNetStageConfig
from contextaware_poseformer_tpu.models.backbone_common import (
    ConvBN,
    add_upsampled_nearest,
)


class HRNet(nn.Module):
    cfg: BackboneConfig
    dtype: Any = jnp.float32

    def _conv(self, name: str, feat: int, ks: int, stride: int, relu: bool):
        return ConvBN(
            features=feat, kernel_size=ks, stride=stride, relu=relu,
            dtype=self.dtype, quantize=self.cfg.quantize,
            calib_quantile=self.cfg.calib_quantile,
            serve_static_amax=self.cfg.serve_static_amax, name=name,
        )

    def _basic_block(self, x, prefix: str, planes: int):
        # BasicBlock (pose_hrnet.py:66-95); stage branches never need a
        # downsample (in/out channels always match, stride 1).
        y = self._conv(f"{prefix}.conv1", planes, 3, 1, relu=True)(x)
        y = self._conv(f"{prefix}.conv2", planes, 3, 1, relu=False)(y)
        return jax.nn.relu(y + x)

    def _bottleneck(self, x, prefix: str, planes: int, downsample: bool):
        # Bottleneck expansion=4 (pose_hrnet.py:98-136)
        residual = x
        y = self._conv(f"{prefix}.conv1", planes, 1, 1, relu=True)(x)
        y = self._conv(f"{prefix}.conv2", planes, 3, 1, relu=True)(y)
        y = self._conv(f"{prefix}.conv3", planes * 4, 1, 1, relu=False)(y)
        if downsample:
            residual = self._conv(
                f"{prefix}.downsample.0", planes * 4, 1, 1, relu=False
            )(x)
        return jax.nn.relu(y + residual)

    def _layer1_int8(self, x):
        """layer1 with END-TO-END int8 tensors (quantize="serve").

        layer1 moves the backbone's biggest tensors (64x48x256 at batch) and
        runs at HBM roofline in bf16 (~43 TF/s effective; PERF.md), so the
        win comes from HALVING tensor bytes, not from the MXU: every
        inter-conv tensor including the residual stays int8 in HBM, adds
        dequantize in-register, and block outputs requantize with STATIC
        per-tensor scales recorded by a calibration pass (measured 1.90x on
        the 3-block chain, 3806 -> 2002 us; per-conv int8 with float
        residuals measured NEUTRAL here). Returns (xq_int8, amax) at
        inference — the transition1 convs consume it directly so the
        dequantized float tensor never exists in HBM. During calibration
        (mutable "calib") this method runs the c128 graph (layer1 bottleneck
        convs float, but any ConvBN with both channel counts >= 128 still
        dynamic-int8) while observing scales — observed amax values describe
        the c128 graph, not a fully-float forward.

        CONTRACT: at inference the calib scales MUST be populated (via
        models.prepare_serving / calibrate_quantization). Uninitialized
        (zero) scales clamp to 1e-12 and saturate every activation to
        +/-127 — garbage outputs with no error. prepare_serving runs
        check_calibrated(); direct model.apply users must do the same.
        """
        calibrating = self.is_mutable_collection("calib")

        def cvar(name):
            return self.variable(
                "calib", name, lambda: jnp.zeros((), jnp.float32)
            )

        in_v = cvar("layer1.in_amax")
        names = [f"layer1.{b}" for b in range(4)]
        tvars = {
            f"{n}.{t}": cvar(f"{n}.{t}_amax")
            for n in names
            for t in ("t1", "t2", "out")
        }

        from contextaware_poseformer_tpu.models.backbone_common import (
            observed_amax,
        )

        def observe(v, t):
            v.value = jnp.maximum(
                v.value, observed_amax(t, self.cfg.calib_quantile)
            )

        if calibrating:
            observe(in_v, x)
            for i, n in enumerate(names):
                y = self._conv(f"{n}.conv1", 64, 1, 1, relu=True)(x)
                observe(tvars[f"{n}.t1"], y)
                y = self._conv(f"{n}.conv2", 64, 3, 1, relu=True)(y)
                observe(tvars[f"{n}.t2"], y)
                y = self._conv(f"{n}.conv3", 256, 1, 1, relu=False)(y)
                res = (
                    self._conv(f"{n}.downsample.0", 256, 1, 1, relu=False)(x)
                    if i == 0 else x
                )
                x = jax.nn.relu(y + res)
                observe(tvars[f"{n}.out"], x)
            return x

        if self.cfg.layer1_impl == "pallas":
            return self._layer1_pallas(x, in_v, tvars, names)

        def quant(t, amax):
            return jnp.clip(
                jnp.round(t.astype(jnp.float32) * (127.0 / amax)), -127, 127
            ).astype(jnp.int8)

        amax = jnp.maximum(in_v.value, 1e-12)
        xq = quant(x, amax)
        for i, n in enumerate(names):
            a1 = jnp.maximum(tvars[f"{n}.t1"].value, 1e-12)
            a2 = jnp.maximum(tvars[f"{n}.t2"].value, 1e-12)
            y = self._conv(f"{n}.conv1", 64, 1, 1, relu=True)(
                None, x_quant=(xq, amax))
            y = self._conv(f"{n}.conv2", 64, 3, 1, relu=True)(
                None, x_quant=(quant(y, a1), a1))
            y = self._conv(f"{n}.conv3", 256, 1, 1, relu=False)(
                None, x_quant=(quant(y, a2), a2))
            if i == 0:
                res = self._conv(f"{n}.downsample.0", 256, 1, 1, relu=False)(
                    None, x_quant=(xq, amax))
            else:
                res = xq.astype(y.dtype) * (amax / 127.0).astype(y.dtype)
            o = jax.nn.relu(y + res)
            amax = jnp.maximum(tvars[f"{n}.out"].value, 1e-12)
            xq = quant(o, amax)
        return xq, amax

    def _layer1_pallas(self, x, in_v, tvars, names):
        """Fused 4-block VMEM-resident chain (ops/layer1_chain.py).

        Same quantized arithmetic as the XLA path below — the int8 kernels,
        folded affines (eff_scale = scale*wscale*amax/127, bias) and static
        requant scales are assembled here from the SAME ConvBN params/calib
        variables (ConvBN packed=True protocol) and handed to one Pallas
        launch, so HBM sees only the bf16 stem input and the int8 output.
        Epilogues are bf16 to match ConvBN's eff_scale cast; requires the
        backbone dtype to be bfloat16 (the deploy preset's setting).
        """
        assert self.dtype == jnp.bfloat16, (
            "layer1_impl='pallas' hardcodes the XLA path's bf16 epilogue "
            f"arithmetic; backbone dtype is {self.dtype}"
        )
        from contextaware_poseformer_tpu.ops.layer1_chain import layer1_chain

        def pieces(name, feat, ks, cin, relu):
            return self._conv(name, feat, ks, 1, relu=relu)(cin, packed=True)

        a1 = [jnp.maximum(tvars[f"{n}.t1"].value, 1e-12) for n in names]
        a2 = [jnp.maximum(tvars[f"{n}.t2"].value, 1e-12) for n in names]
        ao = [jnp.maximum(tvars[f"{n}.out"].value, 1e-12) for n in names]
        # per-block input amax: stem in, then each block's predecessor out
        ain = [jnp.maximum(in_v.value, 1e-12)] + ao[:3]

        bf16 = jnp.bfloat16
        w1, w2, w3 = [], [], []
        aff = {k: [] for k in ("s1", "b1", "s2", "b2", "s3", "b3")}
        for i, n in enumerate(names):
            kq, ws, sc, bi = pieces(
                f"{n}.conv1", 64, 1, 64 if i == 0 else 256, True
            )
            w1.append(kq[0, 0])
            aff["s1"].append((sc * ws * (ain[i] / 127.0)).astype(bf16))
            aff["b1"].append(bi.astype(bf16))
            kq, ws, sc, bi = pieces(f"{n}.conv2", 64, 3, 64, True)
            # HWIO (3,3,64,64) -> per-dy band (dx-major, channel-minor rows)
            w2.append(kq.reshape(3, 192, 64))
            aff["s2"].append((sc * ws * (a1[i] / 127.0)).astype(bf16))
            aff["b2"].append(bi.astype(bf16))
            kq, ws, sc, bi = pieces(f"{n}.conv3", 256, 1, 64, False)
            w3.append(kq[0, 0])
            aff["s3"].append((sc * ws * (a2[i] / 127.0)).astype(bf16))
            aff["b3"].append(bi.astype(bf16))
        kq, ws, sc, bi = pieces("layer1.0.downsample.0", 256, 1, 64, False)
        pack = {
            "w1_0": w1[0],
            "w1_r": jnp.stack(w1[1:]),
            "w2": jnp.stack(w2),
            "w3": jnp.stack(w3),
            "wds": kq[0, 0],
            "sds": (sc * ws * (ain[0] / 127.0)).astype(bf16)[None, None],
            "bds": bi.astype(bf16)[None, None],
            "sca": jnp.stack(
                [127.0 / ain[0]]
                + [127.0 / a for a in a1]
                + [127.0 / a for a in a2]
                + [127.0 / a for a in ao]
                + [a / 127.0 for a in ain]
            ).astype(jnp.float32),
        }
        for k, rows in aff.items():
            pack[k] = jnp.stack(rows)[:, None, :]
        return layer1_chain(x, pack), ao[3]

    def _hr_module(
        self,
        xs: Sequence[jax.Array],
        prefix: str,
        stage: HRNetStageConfig,
        multi_scale_output: bool,
    ) -> tuple[list[jax.Array], list[jax.Array]]:
        """Returns (fused_outputs, pre-fuse branch outputs). The branch
        outputs matter because the reference's HRModule.forward mutates its
        input list in place (pose_hrnet.py:289-290), so the driver-visible
        x_list after stage4 aliases the FIRST stage-4 module's branch
        outputs — which become feature levels 1-3 (pose_hrnet.py:501)."""
        nb = stage.num_branches
        chans = list(stage.num_channels)

        # branches (pose_hrnet.py:285-290)
        outs = []
        for i in range(nb):
            y = xs[i]
            for b in range(stage.num_blocks[i]):
                y = self._basic_block(y, f"{prefix}.branches.{i}.{b}", chans[i])
            outs.append(y)

        # fuse (pose_hrnet.py:225-303): out_i = relu(sum_j path_ij(x_j))
        return self._fuse(outs, prefix, stage, multi_scale_output), outs

    def _fuse(self, outs, prefix, stage, multi_scale_output):
        """Float fuse (pose_hrnet.py:225-303): out_i = relu(sum_j path_ij)."""
        nb = stage.num_branches
        chans = list(stage.num_channels)
        num_out = nb if multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(nb):
                if j == i:
                    y = outs[j]
                elif j > i:
                    y = self._conv(
                        f"{prefix}.fuse_layers.{i}.{j}.0",
                        chans[i], 1, 1, relu=False,
                    )(outs[j])
                    # bit-identical blocked-view add: the nearest-upsampled
                    # tensor is never materialized (j == i always precedes
                    # j > i, so acc exists here)
                    acc = add_upsampled_nearest(acc, y, 2 ** (j - i))
                    continue
                else:
                    y = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feat = chans[i] if last else chans[j]
                        y = self._conv(
                            f"{prefix}.fuse_layers.{i}.{j}.{k}.0",
                            feat, 3, 2, relu=not last,
                        )(y)
                acc = y if acc is None else acc + y
            fused.append(jax.nn.relu(acc))
        return fused

    def _stage(
        self,
        xs: Sequence[jax.Array],
        name: str,
        stage: HRNetStageConfig,
        multi_scale_output: bool = True,
    ) -> tuple[list[jax.Array], list[jax.Array]]:
        """Returns (final outputs, FIRST module's pre-fuse branch outputs)."""
        # NOTE: the branch BasicBlock chains deliberately stay FLOAT under
        # quantize="serve". An end-to-end int8 variant (mirroring
        # _layer1_int8, fuse layers consuming x_quant) was built and
        # measured: composite 21.14 ms vs 19.29 ms for layer1-only serve —
        # XLA's in-graph conv+requant fusions on the compute-bound narrow
        # 3x3s are ~25% slower than its bf16 fusions, erasing the isolated
        # 1.34-1.82x chain wins (PERF.md "don't redo" ledger).
        first_branch_outs = None
        for m in range(stage.num_modules):
            last = m == stage.num_modules - 1
            mso = multi_scale_output or not last
            xs, branch_outs = self._hr_module(xs, f"{name}.{m}", stage, mso)
            if first_branch_outs is None:
                first_branch_outs = branch_outs
        return xs, first_branch_outs

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (N, H, W, 3) normalized image -> 4 NHWC feature maps."""
        cfg = self.cfg

        # stem (pose_hrnet.py:464-470)
        x = self._conv("conv1", 64, 3, 2, relu=True)(x)
        x = self._conv("conv2", 64, 3, 2, relu=True)(x)

        # layer1: 4x Bottleneck(64), first with 1x1 downsample to 256
        if cfg.quantize == "serve":
            x = self._layer1_int8(x)  # (xq, amax) at inference, float @calib
        else:
            x = self._bottleneck(x, "layer1.0", 64, downsample=True)
            for b in range(1, 4):
                x = self._bottleneck(x, f"layer1.{b}", 64, downsample=False)

        # transition1 (pose_hrnet.py:372-411): 256 -> [C, 2C@/2]. Under
        # "serve" these consume layer1's int8 tensor directly (x_quant) so
        # the dequantized float copy never round-trips HBM.
        c2 = list(cfg.stage2.num_channels)
        if isinstance(x, tuple):
            xs = [
                self._conv("transition1.0.0", c2[0], 3, 1, relu=True)(
                    None, x_quant=x),
                self._conv("transition1.1.0.0", c2[1], 3, 2, relu=True)(
                    None, x_quant=x),
            ]
        else:
            xs = [
                self._conv("transition1.0.0", c2[0], 3, 1, relu=True)(x),
                self._conv("transition1.1.0.0", c2[1], 3, 2, relu=True)(x),
            ]
        ys, _ = self._stage(xs, "stage2", cfg.stage2)

        # transition2: channels match for existing branches -> identity; one
        # new stride-2 branch from the LAST previous branch (pose_hrnet.py:484)
        c3 = list(cfg.stage3.num_channels)
        xs = [
            ys[0],
            ys[1],
            self._conv("transition2.2.0.0", c3[2], 3, 2, relu=True)(ys[-1]),
        ]
        ys, _ = self._stage(xs, "stage3", cfg.stage3)

        c4 = list(cfg.stage4.num_channels)
        xs = [
            ys[0],
            ys[1],
            ys[2],
            self._conv("transition3.3.0.0", c4[3], 3, 2, relu=True)(ys[-1]),
        ]
        stage4 = cfg.stage4
        if cfg.hrnet_stage4_truncate:
            # accuracy-gated deploy trade: only module 0 runs; its branch
            # outputs (levels 1-3) are IDENTICAL to the full graph's, and
            # level0 becomes module 0's fused output. Module-0 parameter
            # names are unchanged, so a full-graph checkpoint applies
            # directly (modules 1-2 params simply go unused).
            import dataclasses

            stage4 = dataclasses.replace(stage4, num_modules=1)
        ys, s4_branch0 = self._stage(xs, "stage4", stage4,
                                     multi_scale_output=False)

        # reference quirk (verified against the live module with
        # tools/parity_check.py --component backbone): `x_list` at
        # pose_hrnet.py:501 was MUTATED IN PLACE by the first stage-4
        # module's branch loop, so levels 1-3 are that module's pre-fuse
        # branch outputs — not the transition outputs.
        return [ys[0], s4_branch0[1], s4_branch0[2], s4_branch0[3]]
