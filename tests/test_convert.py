"""Checkpoint-converter coverage: lifter and composite key mappings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.config import LifterConfig
from contextaware_poseformer_tpu.models import PoseLifter
from contextaware_poseformer_tpu.models import convert


def _torch_sd_from_flax(params, depth, levels, use_deformable):
    """Synthesize a reference-style torch state dict from flax lifter params
    (the inverse of convert_lifter's mapping)."""
    sd = {}

    def lin(tname, p):
        sd[f"{tname}.weight"] = np.asarray(p["dense"]["kernel"]).T
        if "bias" in p["dense"]:
            sd[f"{tname}.bias"] = np.asarray(p["dense"]["bias"])

    def ln(tname, p):
        sd[f"{tname}.weight"] = np.asarray(p["scale"])
        sd[f"{tname}.bias"] = np.asarray(p["bias"])

    def block(tname, p):
        ln(f"{tname}.norm1", p["norm1"])
        lin(f"{tname}.attn.qkv", p["attn"]["qkv"])
        lin(f"{tname}.attn.proj", p["attn"]["proj"])
        ln(f"{tname}.norm2", p["norm2"])
        lin(f"{tname}.mlp.fc1", p["mlp"]["fc1"])
        lin(f"{tname}.mlp.fc2", p["mlp"]["fc2"])

    lin("coord_embed", params["coord_embed"])
    sd["Spatial_pos_embed"] = np.asarray(params["pos_embed"])
    ln("head.0", params["head_norm"])
    lin("head.1", params["head"])
    for l in range(levels):
        lin(f"feat_embed.{l}", params[f"feat_embed_{l}"])
    for i in range(depth):
        block(f"res_blocks.{i}", params[f"res_block_{i}"])
        block(f"joint_blocks.{i}", params[f"joint_block_{i}"])
        if use_deformable:
            cb = params[f"context_block_{i}"]
            ln(f"context_blocks.{i}.norm1", cb["norm1"])
            ln(f"context_blocks.{i}.norm2", cb["norm2"])
            lin(f"context_blocks.{i}.attention_weights", cb["attention_weights"])
            lin(f"context_blocks.{i}.sampling_offsets", cb["sampling_offsets"])
            lin(f"context_blocks.{i}.mlp.fc1", cb["mlp"]["fc1"])
            lin(f"context_blocks.{i}.mlp.fc2", cb["mlp"]["fc2"])
            for l in range(levels):
                lin(f"context_blocks.{i}.embed_proj.{l}", cb[f"embed_proj_{l}"])
    return sd


@pytest.mark.slow
@pytest.mark.parametrize("use_deformable", [True, False])
def test_convert_lifter_roundtrip(use_deformable):
    cfg = LifterConfig(embed_dim_ratio=32, depth=2, levels=4,
                       use_deformable=use_deformable)
    dims = (8, 16, 24, 40)
    rng = np.random.RandomState(0)
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    kp = jnp.asarray(rng.uniform(-1, 1, (1, 17, 2)).astype(np.float32))
    feats = [jnp.asarray(rng.randn(1, 8, 6, c).astype(np.float32)) for c in dims]
    params = model.init(jax.random.PRNGKey(0), kp, kp, feats)["params"]
    params = jax.tree.map(np.asarray, params)

    sd = _torch_sd_from_flax(params, 2, 4, use_deformable)
    converted = convert.convert_lifter(
        sd, depth=2, levels=4, use_deformable=use_deformable
    )
    # exact round trip: same tree, same values
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(converted))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path], err_msg=str(path))


def test_convert_lifter_rejects_leftovers_and_missing():
    cfg = LifterConfig(embed_dim_ratio=32, depth=1, levels=4)
    dims = (8, 16, 24, 40)
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    kp = jnp.zeros((1, 17, 2))
    feats = [jnp.zeros((1, 8, 6, c)) for c in dims]
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), kp, kp, feats)["params"],
    )
    sd = _torch_sd_from_flax(params, 1, 4, True)
    sd["mystery.weight"] = np.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert.convert_lifter(sd, depth=1, levels=4)
    del sd["mystery.weight"]
    del sd["coord_embed.weight"]
    with pytest.raises(KeyError, match="coord_embed"):
        convert.convert_lifter(sd, depth=1, levels=4)
