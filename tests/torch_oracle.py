"""Functional torch re-statement of the lifting-net math, used purely as a
numerical oracle for parity tests. Weights come from the flax param tree, so
this also exercises the flax<->torch layout mapping (kernels transposed).

This mirrors the operation ORDER documented in SURVEY.md section 2.1 for
pose_dformer.py; it is a test fixture, not product code.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x))


def linear(x, p):
    w = t(p["dense"]["kernel"]).T.contiguous()  # flax (in,out) -> torch (out,in)
    b = t(p["dense"]["bias"]) if "bias" in p["dense"] else None
    return F.linear(x, w, b)


def layer_norm(x, p, eps):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def attention(x, p, num_heads):
    b, n, c = x.shape
    hd = c // num_heads
    qkv = linear(x, p["qkv"]).reshape(b, n, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd**-0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return linear(out, p["proj"])


def mlp(x, p):
    h = F.gelu(linear(x, p["fc1"]))
    return linear(h, p["fc2"])


def block(x, p, num_heads, eps=1e-6):
    x = x + attention(layer_norm(x, p["norm1"], eps), p["attn"], num_heads)
    x = x + mlp(layer_norm(x, p["norm2"], eps), p["mlp"])
    return x


def deformable_block(tokens, ref, feats_nchw, p, num_heads=4, num_samples=4):
    """tokens (b, levels+1, joints, d); ref (b, joints, 2); feats NCHW list."""
    x0, x = tokens[:, :1], tokens[:, 1:]
    b, l, pj, c = x.shape
    nh, ns = num_heads, num_samples
    residual = x
    h = layer_norm(x + x0, p["norm1"], 1e-5)

    weights = linear(h, p["attention_weights"]).view(b, l, pj, nh, ns)
    weights = F.softmax(weights, dim=-1).unsqueeze(-1)
    offsets = linear(h, p["sampling_offsets"]).reshape(b, l, pj, nh * ns, 2).tanh()
    pos = offsets + ref.view(b, 1, pj, 1, 2)

    sampled = []
    for idx, feats in enumerate(feats_nchw):
        s = F.grid_sample(
            feats, pos[:, idx], padding_mode="border", align_corners=True
        ).permute(0, 2, 3, 1)  # (b, pj, nh*ns, C)
        sampled.append(linear(s, p[f"embed_proj_{idx}"]))
    sampled = torch.stack(sampled, dim=1)  # (b, l, pj, nh*ns, hd)
    sampled = (weights * sampled.view(b, l, pj, nh, ns, -1)).sum(dim=-2)
    sampled = sampled.view(b, l, pj, -1)

    x = residual + sampled
    x = x + mlp(layer_norm(x, p["norm2"], 1e-5), p["mlp"])
    return torch.cat([x0, x], dim=1)


def lifter_forward(params, kp2d, ref, feats_nchw, depth, num_heads=8,
                   use_deformable=True):
    """Full lifting-net forward. Inputs are numpy; returns numpy (b, j, 3)."""
    kp2d, ref = t(kp2d), t(ref)
    feats = [t(f) for f in feats_nchw]
    b, pj, _ = kp2d.shape

    x = linear(kp2d, params["coord_embed"])
    level_tokens = [x]
    for l, f in enumerate(feats):
        s = F.grid_sample(f, ref.unsqueeze(-2), align_corners=True)
        s = s.squeeze(-1).permute(0, 2, 1)  # (b, pj, C)
        level_tokens.append(linear(s, params[f"feat_embed_{l}"]))
    tokens = torch.stack(level_tokens, dim=1)  # (b, levels+1, pj, d)
    tokens = tokens + t(params["pos_embed"])

    if use_deformable:
        for i in range(depth):
            tokens = deformable_block(tokens, ref, feats, params[f"context_block_{i}"])

    levels1 = tokens.shape[1]
    d = tokens.shape[-1]
    x = tokens.permute(0, 2, 1, 3).reshape(b * pj, levels1, d)
    for i in range(depth):
        x = block(x, params[f"res_block_{i}"], num_heads)
    x = x.reshape(b, pj, levels1 * d)
    for i in range(depth):
        x = block(x, params[f"joint_block_{i}"], num_heads)

    x = F.layer_norm(
        x, (x.shape[-1],), t(params["head_norm"]["scale"]),
        t(params["head_norm"]["bias"]), 1e-5,
    )
    x = linear(x, params["head"])
    return x.numpy()


# ---------------------------------------------------------------------------
# HRNet oracle: consumes a torch-style state dict directly (conv+eval-BN),
# mirroring the 4-stage HRNet graph described in SURVEY.md section 2.1.
# ---------------------------------------------------------------------------


def _bn_name(conv_name):
    head, _, base = conv_name.rpartition(".")
    if base.startswith("conv"):
        return f"{head}.bn{base[4:]}" if head else f"bn{base[4:]}"
    return f"{head}.{int(base) + 1}" if head else str(int(base) + 1)


def conv_bn(x, sd, name, stride=1, relu=False):
    w = t(sd[name + ".weight"])
    bn = _bn_name(name)
    y = F.conv2d(x, w, stride=stride, padding=(w.shape[-1] - 1) // 2)
    y = F.batch_norm(
        y, t(sd[bn + ".running_mean"]), t(sd[bn + ".running_var"]),
        t(sd[bn + ".weight"]), t(sd[bn + ".bias"]), training=False, eps=1e-5,
    )
    return F.relu(y) if relu else y


def _basic(x, sd, prefix, stride=1):
    y = conv_bn(x, sd, f"{prefix}.conv1", stride, relu=True)
    y = conv_bn(y, sd, f"{prefix}.conv2", 1)
    return F.relu(y + x)


def _bottle(x, sd, prefix, downsample):
    r = x
    y = conv_bn(x, sd, f"{prefix}.conv1", 1, relu=True)
    y = conv_bn(y, sd, f"{prefix}.conv2", 1, relu=True)
    y = conv_bn(y, sd, f"{prefix}.conv3", 1)
    if downsample:
        r = conv_bn(x, sd, f"{prefix}.downsample.0", 1)
    return F.relu(y + r)


def _hr_module(xs, sd, prefix, stage, multi_scale_output):
    nb, chans = stage.num_branches, list(stage.num_channels)
    outs = []
    for i in range(nb):
        y = xs[i]
        for b in range(stage.num_blocks[i]):
            y = _basic(y, sd, f"{prefix}.branches.{i}.{b}")
        outs.append(y)
    fused = []
    for i in range(nb if multi_scale_output else 1):
        acc = None
        for j in range(nb):
            if j == i:
                y = outs[j]
            elif j > i:
                y = conv_bn(outs[j], sd, f"{prefix}.fuse_layers.{i}.{j}.0", 1)
                y = F.interpolate(y, scale_factor=2 ** (j - i), mode="nearest")
            else:
                y = outs[j]
                for k in range(i - j):
                    last = k == i - j - 1
                    y = conv_bn(
                        y, sd, f"{prefix}.fuse_layers.{i}.{j}.{k}.0", 2,
                        relu=not last,
                    )
            acc = y if acc is None else acc + y
        fused.append(F.relu(acc))
    return fused, outs


def _hr_stage(xs, sd, name, stage, multi_scale_output=True):
    first_branch_outs = None
    for m in range(stage.num_modules):
        mso = multi_scale_output or m < stage.num_modules - 1
        xs, branch_outs = _hr_module(xs, sd, f"{name}.{m}", stage, mso)
        if first_branch_outs is None:
            first_branch_outs = branch_outs
    return xs, first_branch_outs


def hrnet_forward(sd, x_nchw, cfg):
    x = t(x_nchw)
    x = conv_bn(x, sd, "conv1", 2, relu=True)
    x = conv_bn(x, sd, "conv2", 2, relu=True)
    x = _bottle(x, sd, "layer1.0", True)
    for b in range(1, 4):
        x = _bottle(x, sd, f"layer1.{b}", False)

    c2 = list(cfg.stage2.num_channels)
    xs = [
        conv_bn(x, sd, "transition1.0.0", 1, relu=True),
        conv_bn(x, sd, "transition1.1.0.0", 2, relu=True),
    ]
    ys, _ = _hr_stage(xs, sd, "stage2", cfg.stage2)
    xs = [ys[0], ys[1], conv_bn(ys[-1], sd, "transition2.2.0.0", 2, relu=True)]
    ys, _ = _hr_stage(xs, sd, "stage3", cfg.stage3)
    xs = [ys[0], ys[1], ys[2], conv_bn(ys[-1], sd, "transition3.3.0.0", 2, relu=True)]
    # reference aliasing quirk: levels 1-3 = first stage-4 module's pre-fuse
    # branch outputs (pose_hrnet.py:289-290,501); verified live by
    # tools/parity_check.py --component backbone
    ys, s4b0 = _hr_stage(xs, sd, "stage4", cfg.stage4, multi_scale_output=False)
    return [f.numpy() for f in (ys[0], s4b0[1], s4b0[2], s4b0[3])]


def random_state_dict_for(flax_flat_params, rng):
    """Random torch state dict matching a flat folded-conv param tree."""
    sd = {}
    for name, leaf in flax_flat_params.items():
        kh, kw, cin, cout = leaf["kernel"].shape
        # variance-preserving scale: keeps activations O(1) through deep
        # stacks so relative-error parity checks stay well-conditioned
        std = (2.0 / (cin * kh * kw)) ** 0.5
        sd[name + ".weight"] = (rng.randn(cout, cin, kh, kw) * std).astype(np.float32)
        bn = _bn_name(name)
        sd[bn + ".weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[bn + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn + ".running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn + ".running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# CPN oracle (ResNet-50 + globalNet + refineNet), SURVEY.md section 2.1
# ---------------------------------------------------------------------------


def _res_bottle(x, sd, prefix, stride, downsample):
    r = x
    y = conv_bn(x, sd, f"{prefix}.conv1", 1, relu=True)
    y = conv_bn(y, sd, f"{prefix}.conv2", stride, relu=True)
    y = conv_bn(y, sd, f"{prefix}.conv3", 1)
    if downsample:
        r = conv_bn(x, sd, f"{prefix}.downsample.0", stride)
    return F.relu(y + r)


def cpn_forward(sd, x_nchw):
    x = t(x_nchw)
    x = conv_bn(x, sd, "resnet.conv1", 2, relu=True)
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for li, (p, blocks) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
        stride = 1 if li == 0 else 2
        x = _res_bottle(x, sd, f"resnet.layer{li+1}.0", stride, True)
        for b in range(1, blocks):
            x = _res_bottle(x, sd, f"resnet.layer{li+1}.{b}", 1, False)
        feats.append(x)
    res_out = feats[::-1]

    global_fms, up = [], None
    for i in range(4):
        lat = conv_bn(res_out[i], sd, f"global_net.laterals.{i}.0", 1, relu=True)
        feature = lat if i == 0 else lat + up
        global_fms.append(feature)
        if i != 3:
            u = F.interpolate(feature, scale_factor=2, mode="bilinear",
                              align_corners=True)
            up = conv_bn(u, sd, f"global_net.upsamples.{i}.1", 1)

    out_hw = (x.shape[2] * 8, x.shape[3] * 8)
    refine_fms = []
    for i in range(4):
        y = global_fms[i]
        for k in range(4 - i - 1):
            r = y
            z = conv_bn(y, sd, f"refine_net.cascade.{i}.{k}.conv1", 1, relu=True)
            z = conv_bn(z, sd, f"refine_net.cascade.{i}.{k}.conv2", 1, relu=True)
            z = conv_bn(z, sd, f"refine_net.cascade.{i}.{k}.conv3", 1)
            r = conv_bn(y, sd, f"refine_net.cascade.{i}.{k}.downsample.0", 1)
            y = F.relu(z + r)
        y = F.interpolate(y, size=out_hw, mode="bilinear", align_corners=True)
        refine_fms.append(y.numpy())
    return refine_fms


# ---------------------------------------------------------------------------
# CPN COCO harness oracle: globalNet predict heads + refineNet final_predict
# (globalNet.py:46-59, refineNet.py:64-70), eval-mode BN
# ---------------------------------------------------------------------------


def _coco_predict_head(feature, sd, i, out_hw):
    p = f"global_net.predict.{i}"
    y = conv_bn(feature, sd, f"{p}.0", 1, relu=True)
    y = F.conv2d(y, t(sd[f"{p}.3.weight"]), padding=1)
    y = F.interpolate(y, size=out_hw, mode="bilinear", align_corners=True)
    return F.batch_norm(
        y, t(sd[f"{p}.5.running_mean"]), t(sd[f"{p}.5.running_var"]),
        t(sd[f"{p}.5.weight"]), t(sd[f"{p}.5.bias"]), training=False, eps=1e-5,
    )


def cpn_coco_forward(sd, x_nchw):
    """(global_outs 4x, refine_out) for the COCO-head CPN (eval-mode BN)."""
    x = t(x_nchw)
    x = conv_bn(x, sd, "resnet.conv1", 2, relu=True)
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for li, (p, blocks) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
        stride = 1 if li == 0 else 2
        if f"resnet.layer{li+1}.0.conv1.weight" not in sd:
            continue
        x = _res_bottle(x, sd, f"resnet.layer{li+1}.0", stride, True)
        b = 1
        while f"resnet.layer{li+1}.{b}.conv1.weight" in sd:
            x = _res_bottle(x, sd, f"resnet.layer{li+1}.{b}", 1, False)
            b += 1
        feats.append(x)
    res_out = feats[::-1]
    out_hw = (x.shape[2] * 8, x.shape[3] * 8)

    global_fms, global_outs, up = [], [], None
    for i in range(4):
        lat = conv_bn(res_out[i], sd, f"global_net.laterals.{i}.0", 1, relu=True)
        feature = lat if i == 0 else lat + up
        global_fms.append(feature)
        if i != 3:
            u = F.interpolate(feature, scale_factor=2, mode="bilinear",
                              align_corners=True)
            up = conv_bn(u, sd, f"global_net.upsamples.{i}.1", 1)
        global_outs.append(_coco_predict_head(feature, sd, i, out_hw))

    def _refine_bottle(y, prefix):
        r = conv_bn(y, sd, f"{prefix}.downsample.0", 1)
        z = conv_bn(y, sd, f"{prefix}.conv1", 1, relu=True)
        z = conv_bn(z, sd, f"{prefix}.conv2", 1, relu=True)
        z = conv_bn(z, sd, f"{prefix}.conv3", 1)
        return F.relu(z + r)

    refine_fms = []
    for i in range(4):
        y = global_fms[i]
        for k in range(4 - i - 1):
            y = _refine_bottle(y, f"refine_net.cascade.{i}.{k}")
        y = F.interpolate(y, size=out_hw, mode="bilinear", align_corners=True)
        refine_fms.append(y)
    cat = torch.cat(refine_fms, dim=1)
    y = _refine_bottle(cat, "refine_net.final_predict.0")
    y = F.conv2d(y, t(sd["refine_net.final_predict.1.weight"]), padding=1)
    refine_out = F.batch_norm(
        y, t(sd["refine_net.final_predict.2.running_mean"]),
        t(sd["refine_net.final_predict.2.running_var"]),
        t(sd["refine_net.final_predict.2.weight"]),
        t(sd["refine_net.final_predict.2.bias"]), training=False, eps=1e-5,
    )
    return [g.numpy() for g in global_outs], refine_out.numpy()


def random_state_dict_for_coco(variables, rng):
    """Random torch state dict matching a CPNCoco variables tree (params with
    ConvBNLive dicts / bare ".kernel" leaves / standalone BN dicts, plus
    batch_stats)."""
    import collections.abc as _abc

    sd = {}

    def _bn_keys(bn_name, cout):
        sd[bn_name + ".weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[bn_name + ".bias"] = (rng.randn(cout) * 0.1).astype(np.float32)
        sd[bn_name + ".running_mean"] = (rng.randn(cout) * 0.1).astype(np.float32)
        sd[bn_name + ".running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)

    for name, leaf in variables["params"].items():
        if isinstance(leaf, _abc.Mapping) and "bn" in leaf:
            kh, kw, cin, cout = leaf["kernel"].shape
            std = (2.0 / (cin * kh * kw)) ** 0.5
            sd[name + ".weight"] = (
                rng.randn(cout, cin, kh, kw) * std).astype(np.float32)
            _bn_keys(_bn_name(name), cout)
        elif not isinstance(leaf, _abc.Mapping):
            assert name.endswith(".kernel"), name
            kh, kw, cin, cout = leaf.shape
            std = (2.0 / (cin * kh * kw)) ** 0.5
            sd[name[: -len(".kernel")] + ".weight"] = (
                rng.randn(cout, cin, kh, kw) * std).astype(np.float32)
        else:  # standalone BatchNorm
            _bn_keys(name, leaf["scale"].shape[0])
    return sd
