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
