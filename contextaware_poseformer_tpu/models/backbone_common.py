"""Shared backbone building blocks: folded-BN convolutions and resize ops.

The backbones run frozen in eval mode on every live reference path
(ContextPose/train.py:146-148, human36m.yaml:21 fix_weights, 3DHP
common/cfg.py fix_weights=True), so BatchNorm is exactly an affine transform
of its running statistics. We represent each torch (Conv2d, BatchNorm2d) pair
as ONE folded module with parameters {kernel, scale, bias}:

    y = conv(x, kernel) * scale + bias,   scale = gamma / sqrt(var + eps),
                                          bias  = beta - mean * scale.

XLA folds the affine into the convolution at compile time; checkpoint
conversion computes scale/bias once from the torch running stats
(models/convert.py).

Module names are the torch parameter prefixes verbatim (e.g.
"layer1.0.conv1"), which keeps the param tree FLAT and makes the torch->flax
mapping a pure string rule.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def observed_amax(x: jax.Array, quantile: float = 1.0) -> jax.Array:
    """Calibration statistic for activation int8 scales.

    quantile=1.0: exact max|x|. quantile<1 (e.g. 0.9995): a histogram
    estimate of the q-quantile of |x| — robust to the handful of outlier
    activations that otherwise stretch the int8 grid (values above the
    estimate saturate at +/-127 at inference, trading rare clipping for
    2-5x finer resolution on the bulk). Histogram (2048 bins over
    [0, max|x|]) instead of a sort: linear cost, calibration runs on the
    host CPU backend (models/capf.py prepare_serving).
    """
    ax = jnp.abs(x.astype(jnp.float32))
    m = jnp.max(ax)
    if quantile >= 1.0:
        return m
    nbins = 2048
    hist, _ = jnp.histogram(ax, bins=nbins, range=(0.0, m))
    cum = jnp.cumsum(hist) / ax.size
    idx = jnp.argmax(cum >= quantile)
    # upper edge of the first bin reaching the quantile
    return (idx + 1).astype(jnp.float32) * m / nbins


class ConvBN(nn.Module):
    """Conv2d (no bias) + folded frozen BatchNorm + optional ReLU, NHWC.

    `quantize="c128"` switches convs with BOTH channel counts >= 128 to an
    int8 path (per-output-channel symmetric weight quant + DYNAMIC
    per-tensor activation quant, int32 accumulation). Measured 1.85x on the
    16x12x128 HRNet branch INCLUDING the quant passes; narrower convs and
    the mixed-width layer1 bottlenecks measured slower under dynamic quant
    (the amax reduce + requant are full HBM passes, PERF.md) and take the
    float path there.

    `quantize="static"` extends int8 to 3x3 convs with both channel counts
    >= 16 (branch BasicBlocks, stem conv2, transitions, bottleneck conv2s)
    and keeps the >=128 rule for 1x1s, replacing the dynamic amax reduce
    with a per-conv STATIC calibration scale stored in the "calib" variable
    collection: the requant becomes a pure elementwise op that XLA fuses
    into the producer epilogue. Measured (device traces, batch 128): 1.34x
    on 64x48x32 residual chains, 1.82x on 32x24x64, 1.35x on the stem conv2
    — exactly the shapes dynamic quant lost on. The layer1 1x1 bottleneck
    convs are EXCLUDED: they run at HBM roofline (~43 TF/s) and measured
    int8-neutral (3805 vs 3861 us), so the rounding would buy nothing.
    Calibrate with `calibrate_quantization` (runs forward passes with
    mutable=["calib"]; each ConvBN records max|input|). An uncalibrated
    static model computes garbage — check_calibrated() guards.

    The frozen backbone means the rounding is inference-only — grads never
    flow here (stop_gradient in capf).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = False
    dtype: Any = jnp.float32
    quantize: str = "none"  # "none" | "c128" | "static" | "serve"
    calib_quantile: float = 1.0  # see observed_amax
    # quantize="serve" only: use CALIBRATED static amax for the wide-conv
    # int8 path instead of computing max|x| at runtime — removes one
    # full-tensor abs-reduce per wide conv per step (CPN deploy: ~0.7
    # ms/iter of abs_reduce fusions). Calibration passes still run the
    # dynamic (c128-graph) arithmetic while observing, preserving the
    # calibration-bit-matches-c128 invariant.
    serve_static_amax: bool = False

    @nn.compact
    def __call__(self, x, x_quant=None, packed=False, raw=False):
        """x: float NHWC input, or None when `x_quant` is given.

        `x_quant=(xq_int8, amax)` feeds an already-quantized tensor with its
        per-tensor max|value| scale (the end-to-end int8 layer1 flow,
        HRNet._layer1_int8): the conv runs int8 with the caller's scale and
        returns the usual float output — no internal quantize pass.

        `packed=True` (x is the input CHANNEL COUNT, an int) skips the conv
        and returns `(kernel_q, wscale, scale, bias)` — the raw pieces the
        fused Pallas layer1 chain (ops/layer1_chain.py) assembles itself.
        Participates in the same "qweights" store/populate protocol.

        `raw=True` (float path only): return `scale * conv(x)` WITHOUT the
        bias add or relu — the linear part of the affine, used by the
        normalize-fold stem to evaluate the conv on the constant
        normalization-offset image (models/cpn.py cpn_fold_normalize).
        """
        in_ch = (
            x if packed else (x if x_quant is None else x_quant[0]).shape[-1]
        )
        ks = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (ks, ks, in_ch, self.features),
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        pad = (ks - 1) // 2
        wide = in_ch >= 128 and self.features >= 128
        serve_static = (
            x_quant is None and self.quantize == "serve"
            and self.serve_static_amax and wide
        )
        dyn_int8 = x_quant is None and (
            self.quantize in ("c128", "serve") and wide and not serve_static
        )
        static_int8 = serve_static or (
            x_quant is None and self.quantize == "static" and (
                (ks == 3 and in_ch >= 16 and self.features >= 16) or wide
            )
        )
        if static_int8:
            amax_v = self.variable(
                "calib", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.is_mutable_collection("calib"):
                # calibration pass: observe the amax statistic, then run the
                # float path ("static") or the dynamic c128 path ("serve" —
                # keeps calibration bit-matching the c128 graph)
                amax_v.value = jnp.maximum(
                    amax_v.value, observed_amax(x, self.calib_quantile)
                )
                static_int8 = False
                if serve_static:
                    dyn_int8 = True
        if packed or dyn_int8 or static_int8 or x_quant is not None:
            # Weight quantization. Computing round(k / wscale) per call costs
            # a small reduce+round op PER CONV PER STEP — ~220 extra op
            # dispatches under "static" on HRNet-32, measured ~+1.1 ms/step,
            # more than the int8 win itself. prepare_int8_weights() runs one
            # pass with mutable=["qweights"] that stores the quantized
            # kernels; afterwards they are free at apply time. Skipped at
            # init so loaded checkpoints can't silently carry stale values.
            use_stored = self.has_variable("qweights", "kernel_q") or (
                self.is_mutable_collection("qweights")
                and not self.is_initializing()
            )
            if use_stored:
                k32 = kernel.astype(jnp.float32)
                kq_v = self.variable(
                    "qweights", "kernel_q",
                    lambda: jnp.zeros(kernel.shape, jnp.int8),
                )
                ws_v = self.variable(
                    "qweights", "wscale",
                    lambda: jnp.ones((self.features,), jnp.float32),
                )
                if self.is_mutable_collection("qweights"):
                    ws_v.value = (
                        jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
                    )
                    kq_v.value = jnp.round(k32 / ws_v.value).astype(jnp.int8)
                kq, wscale = kq_v.value, ws_v.value
            else:
                k32 = kernel.astype(jnp.float32)
                wscale = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
                kq = jnp.round(k32 / wscale).astype(jnp.int8)
            if packed:
                return kq, wscale, scale, bias
            if x_quant is not None:
                xq, xq_amax = x_quant
                amax = jnp.maximum(
                    xq_amax.astype(jnp.float32), 1e-12
                ) / 127.0
            else:
                if static_int8:
                    amax = jnp.maximum(amax_v.value, 1e-12) / 127.0
                else:
                    amax = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / amax), -127, 127
                ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq,
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # fold dequant scales into the BN affine
            eff_scale = (scale * wscale * amax).astype(self.dtype)
            y = y.astype(self.dtype) * eff_scale + bias.astype(self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if raw:
                return y * scale.astype(self.dtype)
            y = y * scale.astype(self.dtype) + bias.astype(self.dtype)
        if self.relu:
            y = jax.nn.relu(y)
        return y


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """torch nn.Upsample(scale_factor=f, mode='nearest') on NHWC."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def add_upsampled_nearest(acc: jax.Array, y: jax.Array, factor: int) -> jax.Array:
    """acc + upsample_nearest(y, factor), bit-identical, without
    materializing the upsampled tensor: the add runs on a blocked view of
    `acc` with `y` broadcast across the (factor, factor) sub-blocks, so XLA
    can fuse the broadcast into the add instead of writing the repeated
    tensor to HBM (the HRNet fuse layers' broadcast_in_dim ops, ~0.4 ms of
    the deploy composite at batch 128)."""
    b, hh, ww, c = acc.shape
    f = factor
    blocked = acc.reshape(b, hh // f, f, ww // f, f, c)
    out = blocked + y[:, :, None, :, None, :]
    return out.reshape(b, hh, ww, c)


def _linear_interp_matrix(out_size: int, in_size: int, dtype) -> jax.Array:
    """(out, in) bilinear weights with align_corners=True semantics."""
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype)
    if out_size == 1:
        src = jnp.zeros((1,), jnp.float32)
    else:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    eye = jnp.eye(in_size, dtype=jnp.float32)
    mat = eye[i0] * w0[:, None] + eye[i1] * w1[:, None]
    return mat.astype(dtype)


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch nn.Upsample(mode='bilinear', align_corners=True) on NHWC.

    Formulated as two small dense interpolation matmuls (separable), which XLA
    maps straight onto the MXU — no gather needed (CPN globalNet/refineNet
    upsampling, networks/globalNet.py:40-45, refineNet.py:63).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    mh = _linear_interp_matrix(oh, h, x.dtype)
    mw = _linear_interp_matrix(ow, w, x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("pw,nowc->nopc", mw, y)


def calibrate_quantization(apply_fn, variables: dict, batches) -> dict:
    """Populate the "calib" activation-scale collection for quantize="static".

    `apply_fn(variables, batch, mutable=["calib"])` must run the model
    forward (e.g. functools.partial(model.apply) with the remaining call args
    bound, or a lambda). Each ConvBN records the running max|input| across
    all batches. Returns `variables` with the updated calib collection.
    """
    for batch in batches:
        _, upd = apply_fn(variables, batch, mutable=["calib"])
        # a model with no statically-quantized convs (e.g. CPN under
        # "serve", which only has dynamic-quant wide convs) creates no
        # calib variables at all — an empty collection is valid
        variables = {**variables, "calib": upd.get("calib", {})}
    return variables


def prepare_int8_weights(apply_fn, variables: dict, batch) -> dict:
    """Pre-quantize int8 conv kernels into the "qweights" collection.

    One forward pass with mutable=["qweights"]; each int8-path ConvBN stores
    round(kernel / wscale) so apply time pays zero weight-quant ops (per-call
    quantization measured ~+1.1 ms/step on HRNet-32 under quantize="static").
    Re-run this after ANY change to the backbone params — stored kernels do
    not track later param updates (the frozen backbone makes this a one-time
    cost in practice). For quantize="static", run calibrate_quantization
    FIRST (this pass uses the static path, which needs populated scales).
    """
    _, upd = apply_fn(variables, batch, mutable=["qweights"])
    return {**variables, "qweights": upd.get("qweights", {})}


def params_fingerprint(params) -> "np.ndarray":
    """Cheap content fingerprint of a param tree (16 bytes, uint8).

    sha256 over the tree structure + every leaf's shape/dtype, plus the raw
    bytes of a small deterministic sample of leaves (the four smallest and
    the first — small leaves are cheap to fetch from device and a new
    checkpoint changes them along with everything else). A guard against
    accidental params/qweights mixing, not a cryptographic seal: a targeted
    edit of one unsampled kernel can evade it.
    """
    import hashlib

    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    h = hashlib.sha256()
    for path, leaf in flat:
        h.update(str(path).encode())
        h.update(str(jnp.shape(leaf)).encode())
        h.update(str(jnp.result_type(leaf)).encode())
    sample = sorted(
        flat,
        key=lambda kv: (int(np.prod(jnp.shape(kv[1]), dtype=np.int64)),
                        str(kv[0])),
    )[:4]
    if flat:
        sample.append(flat[0])
    for path, leaf in sample:
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return np.frombuffer(h.digest()[:16], dtype=np.uint8).copy()


def check_serving_fresh(variables: dict) -> None:
    """Raise if stored qweights/calib were prepared for a DIFFERENT params
    tree than variables["params"] (the stale-kernel hazard: pre-quantized
    kernels do not track later param changes — see prepare_int8_weights).
    No-op for variables without serving collections or without the
    fingerprint stamp (pre-stamp artifacts)."""
    import numpy as np

    stored = variables.get("qmeta", {}).get("params_fingerprint")
    if stored is None or not variables.get("qweights"):
        return
    params = variables.get("params", {})
    target = params.get("backbone", params)
    now = params_fingerprint(target)
    if not np.array_equal(np.asarray(stored), now):
        raise ValueError(
            "stale serving collections: the qweights/calib in `variables` "
            "were prepared for a different params tree than "
            'variables["params"]. Re-run models.prepare_serving() after any '
            "backbone param change."
        )


def check_calibrated(variables: dict) -> None:
    """Raise if a quantize="static" model has unpopulated calibration scales
    (an uncalibrated static model silently computes garbage)."""
    calib = variables.get("calib")
    if calib is None:
        raise ValueError(
            'quantize="static" needs a "calib" collection; run '
            "calibrate_quantization() first"
        )
    bad = [
        "/".join(str(k) for k in path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(calib)[0]
        if float(jnp.max(leaf)) <= 0.0
    ]
    if bad:
        raise ValueError(f"uncalibrated activation scales: {bad[:5]} ...")


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC.

    Identity init (-inf / int min) so padding never wins: every window of
    the pad=1 grid holds >=4 real pixels. int8 inputs are exact — max
    commutes with the monotone quantize, so pooling the quantized stem
    equals quantizing the pooled stem (models/cpn.py stream path)."""
    # init must stay a CONCRETE (numpy) scalar: a traced jnp init breaks
    # the reduce_window autodiff rule ("Linearization failed ...") on the
    # training path; a bare python int arrives as int32 and fails the
    # int8 dtype check.
    init = (
        np.asarray(np.iinfo(np.dtype(x.dtype)).min, x.dtype)[()]
        if jnp.issubdtype(x.dtype, jnp.integer)
        else -jnp.inf
    )
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
