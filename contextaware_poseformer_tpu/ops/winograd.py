"""Winograd F(2x2, 3x3) formulation of the stride-1 3x3 convolution.

Target: the HRNet stage-branch BasicBlock conv chains
(/root/reference/ContextPose/mvn/models/pose_hrnet.py:66-95) — 10.4 ms of
the 18.8 ms deploy composite, measured AT the MXU packing ceiling for
C=32/64 in the direct formulation (PERF.md round-2 budget). Winograd
executes 2.25x fewer MACs per output (16 transformed-domain products per
2x2 output tile vs 36 direct), which is the only way to move a ceiling
that schedule-level levers cannot.

The TPU-shaped question is not the MAC count but the MXU packing of the
transformed-domain product: Winograd turns one (M, 9*Cin) x (9*Cin, Cout)
implicit GEMM into SIXTEEN independent (M/4, Cin) x (Cin, Cout) GEMMs —
the contraction narrows from 9*Cin to Cin, and BOTH matmul dims K and N
become the channel count. For C=32 the MXU pads K 32->128 and N 32->128
(1/16 useful), for C=64 1/4 useful; the 2.25x MAC saving must beat that
padding loss plus the (VPU, bandwidth-heavy) tile transforms. Two packings
are provided so the A/B (experiments/winograd_ab.py) can measure the best
case per shape:

  pack=1  : one batched dot_general over the 16 tile positions, tile
            positions in the batch dim, full tile count in M. XLA/Mosaic
            pads each (K=C, N=C) product to MXU tiles.
  pack=4  : groups of 4 tile positions merged BLOCK-DIAGONALLY into one
            (M/4, 4C) x (4C, 4C) GEMM (4 groups). Executes 4x the useful
            MACs, but at C=32 the operands are exactly 128-wide — full MXU
            tiles, no padding. Net executed-MAC ratio vs pack=1 at C=32:
            4/16 = 0.25 of the padded volume.

Numerics: tile transforms run in f32 on the VPU (B/A matrices are 0/±1 —
adds only, no rounding risk); the transformed-domain products default to
bf16 inputs with f32 accumulation to use the same MXU path as the direct
bf16 convs they would replace. Winograd F(2,3) amplifies input error by a
small constant (||B^T||^2 ~ 4); parity tests bound the drift vs
lax.conv_general_dilated and tools/deploy_numerics.py measures the mm-level
effect before any shipping decision.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["transform_kernel", "winograd_conv3x3"]

# G for F(2x2, 3x3): (4, 3). U = G g G^T per (cin, cout).
_G = np.array(
    [
        [1.0, 0.0, 0.0],
        [0.5, 0.5, 0.5],
        [0.5, -0.5, 0.5],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def transform_kernel(kernel: jax.Array) -> jax.Array:
    """HWIO (3, 3, Cin, Cout) -> transformed U (16, Cin, Cout), f32.

    Weight transforms happen once (free at inference via the qweights-style
    store pattern); always f32 — the 0.5 coefficients are exact in f32 for
    realistic weight magnitudes.
    """
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"expected 3x3 kernel, got {kernel.shape}")
    g = jnp.asarray(_G)
    k = kernel.astype(jnp.float32)
    # U[a, b, i, o] = sum_{u,v} G[a,u] G[b,v] k[u,v,i,o]
    u = jnp.einsum("au,bv,uvio->abio", g, g, k)
    return u.reshape(16, *u.shape[2:])


def _bt_pairs(d0, d1, d2, d3):
    """Apply B^T along one tile axis: 4 inputs -> 4 combos (adds only)."""
    return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)


def _at_pairs(m0, m1, m2, m3):
    """Apply A^T along one tile axis: 4 inputs -> 2 combos."""
    return (m0 + m1 + m2, m1 - m2 - m3)


def winograd_conv3x3(
    x: jax.Array,
    u: jax.Array,
    *,
    pack: int = 1,
    mm_dtype=jnp.bfloat16,
) -> jax.Array:
    """SAME-padding stride-1 3x3 conv of NHWC `x` with transformed kernel
    `u` (from transform_kernel). H and W must be even (all branch shapes
    are). Returns f32 NHWC.

    pack: 1 (batched over 16 tile positions) or 4 (block-diagonal groups
    of 4 — trades 4x executed MACs for full MXU tiles at C<=32).
    """
    if pack not in (1, 4):
        raise ValueError("pack must be 1 or 4")
    b, h, w, cin = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"H, W must be even, got {(h, w)}")
    cout = u.shape[-1]
    th, tw = h // 2, w // 2

    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[i][j][b, th, tw, c] = xpad[b, 2*th + i, 2*tw + j, c]
    d = [
        [xpad[:, i : i + 2 * th : 2, j : j + 2 * tw : 2, :] for j in range(4)]
        for i in range(4)
    ]
    # V = B^T d B, via 1D passes: rows then columns (adds only, f32 VPU).
    col = [_bt_pairs(d[0][j], d[1][j], d[2][j], d[3][j]) for j in range(4)]
    v = [[None] * 4 for _ in range(4)]
    for i in range(4):
        vi = _bt_pairs(col[0][i], col[1][i], col[2][i], col[3][i])
        for j in range(4):
            v[i][j] = vi[j]

    m = b * th * tw
    vflat = jnp.stack(
        [v[i][j].reshape(m, cin) for i in range(4) for j in range(4)]
    )  # (16, M, Cin)
    uw = u.astype(jnp.float32)

    if pack == 1:
        prod = jax.lax.dot_general(
            vflat.astype(mm_dtype),
            uw.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (16, M, Cout)
    else:
        # Block-diagonal merge of 4 consecutive tile positions: K, N -> 4C.
        vg = (
            vflat.reshape(4, 4, m, cin)
            .transpose(0, 2, 1, 3)
            .reshape(4, m, 4 * cin)
        )
        eye = jnp.eye(4, dtype=jnp.float32)
        # ublk[g, r*cin + i, s*cout + o] = U[4g+r, i, o] * (r == s)
        ublk = jnp.einsum(
            "grio,rs->griso", uw.reshape(4, 4, cin, cout), eye
        ).reshape(4, 4 * cin, 4 * cout)
        pg = jax.lax.dot_general(
            vg.astype(mm_dtype),
            ublk.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (4, M, 4*Cout)
        prod = (
            pg.reshape(4, m, 4, cout).transpose(0, 2, 1, 3).reshape(16, m, cout)
        )

    mm = prod.reshape(4, 4, b, th, tw, cout)
    # Y = A^T M A: columns then rows.
    colm = [_at_pairs(mm[0, j], mm[1, j], mm[2, j], mm[3, j]) for j in range(4)]
    y = [[None] * 2 for _ in range(2)]
    for i in range(2):
        yi0, yi1 = _at_pairs(colm[0][i], colm[1][i], colm[2][i], colm[3][i])
        y[i][0], y[i][1] = yi0, yi1
    # (2, 2, B, th, tw, K) -> interleave -> (B, H, W, K)
    yt = jnp.stack([jnp.stack(y[i]) for i in range(2)])  # (2=dy, 2=dx, ...)
    out = yt.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, cout)
    return out
