"""Mosaic int8 primitive variants for the branch-chain kernel."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 768, 192, 128

rng = np.random.RandomState(0)
xf = rng.randn(M, 128).astype(np.float32) * 2
w = jnp.asarray(rng.randint(-20, 21, (K, N)).astype(np.int8))
xj = jnp.asarray(xf)

def build_ref():
    # reference in numpy: quantize f32 -> int8 window, dy shifts, matmuls
    amax = 4.0
    q = lambda t: np.clip(np.round(t * (127.0 / amax)), -127, 127)
    grp = np.arange(M) % 12
    left = np.roll(xf, 1, 0)[:, 96:128].copy();  left[grp == 0] = 0
    right = np.roll(xf, -1, 0)[:, 0:32].copy();  right[grp == 11] = 0
    xwin = q(np.concatenate([left, xf, right], axis=1)).astype(np.int32)
    wn = np.asarray(w).astype(np.int32)
    acc = xwin @ wn + np.roll(xwin, -12, 0) @ wn
    return acc.astype(np.int32)

want = build_ref()

def common_window(x):
    amax = 4.0
    grp = jax.lax.broadcasted_iota(jnp.int32, (M, 32), 0) % 12
    left = jnp.where(grp == 0, 0.0, pltpu.roll(x, 1, 0)[:, 96:128])
    right = jnp.where(grp == 11, 0.0, pltpu.roll(x, M - 1, 0)[:, 0:32])
    xwin_f = jnp.concatenate([left, x, right], axis=1)  # (M,192) f32
    return jnp.clip(jnp.round(xwin_f * (127.0 / amax)), -127, 127
                    ).astype(jnp.int8)

def kernel_bitcast(x_ref, w_ref, out_ref):
    xq = common_window(x_ref[...])
    acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    x32 = pltpu.bitcast(xq, jnp.int32)          # (M//4, 192)?
    xs = pltpu.bitcast(pltpu.roll(x32, x32.shape[0] - 3, 0), jnp.int8)
    acc += jnp.dot(xs, w_ref[...], preferred_element_type=jnp.int32)
    out_ref[...] = acc

def kernel_slice(x_ref, w_ref, out_ref, scratch):
    xq = common_window(x_ref[...])
    scratch[0:M] = xq
    scratch[M:M+12] = jnp.zeros((12, K), jnp.int8)
    acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    xs = scratch[pl.ds(12, M)]
    acc += jnp.dot(xs, w_ref[...], preferred_element_type=jnp.int32)
    out_ref[...] = acc

for name, kern, extra in [
    ("bitcast", kernel_bitcast, {}),
    ("slice", kernel_slice,
     {"scratch_shapes": [pltpu.VMEM((M + 12, K), jnp.int8)]}),
]:
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            **extra,
        )(xj, w)
        got = np.asarray(out)
        wrap_rows = slice(M - 12, M)  # bitcast roll is circular; ref rolled too
        ok = np.array_equal(got, want)
        print(f"{name}: compiled; exact={ok}; maxdiff={np.abs(got - want).max()}")
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "not implemented" in l or "NotImplemented" in l or "Unsupported" in l or "error:" in l.lower()]
        print(f"{name}: FAILED: {(key[0] if key else msg.splitlines()[0])[:160]}")
