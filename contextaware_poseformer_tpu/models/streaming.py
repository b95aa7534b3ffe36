"""Streaming deployment pipeline: camera frames -> 3D poses, one jitted graph.

BASELINE.md config 5: "video frames -> 2D detector -> context sampling -> 3D
lifting, batched multi-camera". The reference has no serving path at all —
its closest analog is the eval loop (train.py:416-420). Here the deployment
unit is a single compiled function over a (cameras x time) flattened batch:

  uint8 BGR frames + upstream 2D detections (full-frame pixels + crop boxes)
  -> in-graph normalization (augment.normalize_images)
  -> crop-coordinate mapping (full-frame detections -> crop pixel coords via
     the per-frame affine, computed in-graph from center/scale)
  -> frozen backbone (bf16) -> context sampling -> lifter -> (N, 17, 3)

Static shapes: the stream wrapper pads the last partial batch. An optional
exponential moving average over time (per camera) gives cheap temporal
smoothing on the host without breaking the stateless compiled graph.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from contextaware_poseformer_tpu.config import ModelConfig
from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.models.capf import ContextAwarePoseFormer
from contextaware_poseformer_tpu.utils import geometry


@dataclass
class StreamingConfig:
    batch_size: int = 64  # cameras x time slots per compiled step
    use_bf16: bool = True
    ema_alpha: float = 0.0  # 0 disables temporal smoothing


class StreamingLifter:
    """Stateless compiled core + minimal host-side stream plumbing."""

    def __init__(self, model_cfg: ModelConfig, params,
                 cfg: StreamingConfig = StreamingConfig()):
        self.model_cfg = model_cfg
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        self.model = ContextAwarePoseFormer(cfg=model_cfg, dtype=dtype)
        if cfg.use_bf16:
            params = jax.tree_util.tree_map_with_path(
                lambda path, x: x.astype(jnp.bfloat16)
                if x.ndim == 4 and "backbone" in str(path[0]) else x,
                params,
            )
        self.params = params
        h, w = model_cfg.image_shape
        self._hw = (h, w)
        bcfg = model_cfg.backbone

        @jax.jit
        def step(params, frames_u8, kp2d_full_norm, kp2d_crop):
            # raw-u8 passthrough under cpn_fold_normalize (stem-folded
            # normalization); normalize otherwise
            imgs = augment.serving_images(frames_u8, bcfg, dtype=jnp.float32)
            return self.model.apply(params, imgs, kp2d_full_norm, kp2d_crop)

        self._step = step
        self._ema: dict[int, np.ndarray] = {}
        # (ms, n_frames) pairs, trimmed together — frames_per_sec must be
        # computed over the SAME window as the latency sum or it drifts
        # upward without bound once the window trims
        self._latencies: list[tuple[float, int]] = []
        # quantize="serve"/"static" needs calibrated activation scales before
        # the first lift — see prepare()
        self._needs_prepare = model_cfg.backbone.quantize in (
            "serve", "static"
        )

    def prepare(
        self,
        frames_u8: np.ndarray,
        keypoints_2d_full: np.ndarray,
        image_wh: tuple[float, float],
        centers: np.ndarray,
        scales: np.ndarray,
    ) -> None:
        """One-time serve-mode preparation from a batch of REAL frames:
        activation calibration + int8 kernel pre-quantization
        (models.prepare_serving). Required before lift_batch()/stream() when
        the model config uses quantize="serve"/"static"."""
        from contextaware_poseformer_tpu.models.capf import prepare_serving

        kp_norm, crop = self._preprocess(
            keypoints_2d_full, image_wh, centers, scales
        )
        imgs = augment.serving_images(
            jnp.asarray(frames_u8), self.model_cfg.backbone,
            dtype=jnp.float32,
        )
        self.params = prepare_serving(
            self.model, dict(self.params),
            (imgs, jnp.asarray(kp_norm), jnp.asarray(crop)),
        )
        self._needs_prepare = False

    def _preprocess(self, keypoints_2d_full, image_wh, centers, scales):
        h, w = self._hw
        kp_norm = geometry.normalize_screen_coordinates(
            keypoints_2d_full, image_wh[0], image_wh[1]
        ).astype(np.float32)
        # batched affine solve: one (N,3,3) np.linalg.solve instead of a
        # per-frame Python loop (host bottleneck at multi-camera rates)
        trans = geometry.get_affine_transform_batch(centers, scales, (w, h))
        crop = geometry.affine_transform_batch(
            keypoints_2d_full, trans
        ).astype(np.float32)
        return kp_norm, crop

    # -- single compiled step over a fixed-size batch -------------------------

    def lift_batch(
        self,
        frames_u8: np.ndarray,  # (N, H, W, 3) pre-cropped uint8 BGR
        keypoints_2d_full: np.ndarray,  # (N, 17, 2) full-frame pixels
        image_wh: tuple[float, float],  # original frame size for normalization
        centers: np.ndarray,  # (N, 2) crop bbox centers (full-frame px)
        scales: np.ndarray,  # (N, 2) crop bbox scales (/200 convention)
    ) -> np.ndarray:
        if self._needs_prepare:
            raise ValueError(
                f'quantize="{self.model_cfg.backbone.quantize}" needs '
                "calibration: call prepare() with a real frame batch first"
            )
        n = len(frames_u8)
        t0 = time.perf_counter()
        # full-frame detections -> crop pixel coords, batched affine
        kp_norm, crop = self._preprocess(
            keypoints_2d_full, image_wh, centers, scales
        )

        bs = self.cfg.batch_size
        out = np.empty((n, keypoints_2d_full.shape[1], 3), np.float32)
        # Double-buffered: JAX dispatch is async, so enqueue chunk i+1's H2D
        # + compute before fetching chunk i's result — the transfer of the
        # next batch overlaps the current batch's device time.
        inflight: list[tuple[slice, int, jax.Array]] = []

        def drain():
            idx0, m0, r0 = inflight.pop(0)
            out[idx0] = np.asarray(r0)[:m0]

        for start in range(0, n, bs):
            idx = slice(start, min(start + bs, n))
            m = out[idx].shape[0]

            def pad(a):
                if m == bs:
                    return a
                return np.concatenate(
                    [a, np.repeat(a[-1:], bs - m, axis=0)], axis=0
                )

            res = self._step(
                self.params,
                jnp.asarray(pad(frames_u8[idx])),
                jnp.asarray(pad(kp_norm[idx])),
                jnp.asarray(pad(crop[idx])),
            )
            inflight.append((idx, m, res))
            if len(inflight) > 1:
                drain()
        while inflight:
            drain()
        self._record_latency((time.perf_counter() - t0) * 1e3, n)
        return out

    # -- latency accounting ---------------------------------------------------

    def _record_latency(self, ms: float, n_frames: int) -> None:
        self._latencies.append((ms, n_frames))
        if len(self._latencies) > 4096:
            del self._latencies[: len(self._latencies) - 4096]

    def latency_stats(self) -> dict[str, float]:
        """p50/p99 lift_batch wall latency (ms, host-observed: preprocess +
        H2D + device + D2H) over the recorded window, plus mean frames/sec."""
        if not self._latencies:
            return {"n": 0}
        lat = np.asarray([ms for ms, _ in self._latencies])
        frames = sum(n for _, n in self._latencies)
        return {
            "n": len(lat),
            "p50_ms": float(np.percentile(lat, 50)),
            "p90_ms": float(np.percentile(lat, 90)),
            "p99_ms": float(np.percentile(lat, 99)),
            "mean_ms": float(lat.mean()),
            "frames_per_sec": float(frames / (lat.sum() / 1e3)),
        }

    # -- stream interface ------------------------------------------------------

    def stream(
        self,
        frames: Iterator[tuple[int, np.ndarray, np.ndarray]],
        image_wh: tuple[float, float],
        centers_scales,
    ) -> Iterator[tuple[int, np.ndarray]]:
        """Consume (camera_id, frame, detections) items; yield (camera_id,
        pose_3d) with optional per-camera EMA smoothing."""
        buf: list[tuple[int, np.ndarray, np.ndarray]] = []

        def flush():
            cams = [c for c, _, _ in buf]
            fr = np.stack([f for _, f, _ in buf])
            kp = np.stack([k for _, _, k in buf])
            cs = np.stack([centers_scales(c)[0] for c in cams])
            sc = np.stack([centers_scales(c)[1] for c in cams])
            poses = self.lift_batch(fr, kp, image_wh, cs, sc)
            for cam, pose in zip(cams, poses):
                if self.cfg.ema_alpha > 0:
                    prev = self._ema.get(cam)
                    if prev is not None:
                        pose = (
                            self.cfg.ema_alpha * prev
                            + (1 - self.cfg.ema_alpha) * pose
                        )
                    self._ema[cam] = pose
                yield cam, pose

        for item in frames:
            buf.append(item)
            if len(buf) == self.cfg.batch_size:
                yield from flush()
                buf.clear()
        if buf:
            yield from flush()
