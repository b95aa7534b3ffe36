"""MPI-INF-3DHP dataset over the reference npz artifacts.

Consumes `data_train_3dhp.npz` / `data_test_3dhp.npz` exactly as produced by
ContextPose_mpi/dataset/data_util/data_to_npz_3dhp{,_test}.py and consumed by
Fusion/ChunkedGenerator (common/load_data_3dhp_mae.py:46-105,
common/generator_3dhp.py:6-236):

- train: data[seq][0][cam] -> {data_2d [px in 2048x2048], data_2d_crop
  [192x256 px], data_3d [univ mm]}; images pre-cropped on disk at
  s_{subj:02d}_seq_{seq:02d}_ca_{cam}/..._{frame+1:06d}.jpg
  (generator_3dhp.py:126-143; crops by convert_to_small.py:282-289);
- test: data[seq] -> {..., valid}; TS5/TS6 are 1920x1080, others 2048x2048
  (load_data_3dhp_mae.py:93-99); only valid frames are evaluated
  (generator_3dhp.py:45-48).

3D stays in UNIVERSAL MILLIMETERS with the root (joint 14) kept absolute in
storage but zeroed in every loss/metric (run_3dhp.py:66,109,118) — our
root_center(root=14) at batch-prep time is numerically equivalent.

TPU-first: sequences flattened into contiguous arrays + one path per frame;
chunking degenerates to frame indexing because the live model is single-frame
(chunk_length=stride=1, pad=0).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from contextaware_poseformer_tpu.utils.geometry import (
    normalize_screen_coordinates,
)

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


@dataclass
class Mpi3dhpDataset:
    root: str  # images root
    joints_3d: np.ndarray  # (N, 17, 3) float32 mm (univ), root-centered
    joints_2d: np.ndarray  # (N, 17, 2) float32 normalized full-frame GT
    joints_2d_crop: np.ndarray  # (N, 17, 2) float32 crop pixels
    image_paths: np.ndarray  # (N,)
    seq_idx: np.ndarray  # (N,) index into seq_names
    seq_names: tuple[str, ...]
    image_shape: tuple[int, int] = (256, 192)
    # kept for pipeline protocol compatibility (H36M action bucketing)
    action_idx: np.ndarray | None = None

    def __post_init__(self):
        if self.action_idx is None:
            self.action_idx = np.zeros(len(self.image_paths), np.int32)

    def __len__(self):
        return len(self.image_paths)

    def shard(self, rank: int, world_size: int) -> list[int]:
        """Contiguous per-rank slice (same contract as H36MDataset.shard)."""
        n = len(self) // world_size
        dist_size = [
            n if i < world_size - 1 else len(self) - n * (world_size - 1)
            for i in range(world_size)
        ]
        start = n * rank
        end = len(self) if rank == world_size - 1 else start + n
        for name in (
            "joints_3d", "joints_2d", "joints_2d_crop", "image_paths",
            "seq_idx", "action_idx",
        ):
            setattr(self, name, getattr(self, name)[start:end])
        return dist_size

    def load_batch(self, idxs: np.ndarray) -> np.ndarray | None:
        """Native whole-batch decode (frames are pre-cropped on disk,
        convert_to_small.py:282-289); None -> per-item fallback."""
        from contextaware_poseformer_tpu.data import native_loader

        if not native_loader.available():
            return None
        paths = [os.path.join(self.root, str(self.image_paths[i])) for i in idxs]
        return native_loader.load_crop_batch(
            paths, None, self.image_shape, precropped=True
        )

    def load_image(self, idx: int) -> np.ndarray:
        path = os.path.join(self.root, str(self.image_paths[idx]))
        img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(path)
        return img


def _center_3d(data_3d: np.ndarray) -> np.ndarray:
    """Root-center all joints except 14 (load_data_3dhp_mae.py:64-66,86-87);
    we also zero the root itself, matching what every consumer does at use."""
    out = data_3d.astype(np.float32).copy()
    root = out[:, 14:15].copy()
    out -= root
    out[:, 14] = 0.0
    return out


def load_train(npz_path: str, img_root: str) -> Mpi3dhpDataset:
    data = np.load(npz_path, allow_pickle=True)["data"].item()
    j3, j2, j2c, paths, seqi, names = [], [], [], [], [], []
    for seq in sorted(data.keys()):
        subject_name, seq_name = seq.split(" ")
        for cam in sorted(data[seq][0].keys()):
            anim = data[seq][0][cam]
            n = anim["data_3d"].shape[0]
            j3.append(_center_3d(anim["data_3d"]))
            j2.append(
                normalize_screen_coordinates(
                    anim["data_2d"][..., :2].astype(np.float32), 2048, 2048
                ).astype(np.float32)
            )
            j2c.append(anim["data_2d_crop"][..., :2].astype(np.float32))
            # generator_3dhp.py:130-139: s_{subj}_seq_{seq}_ca_{cam}/..._{i+1}.jpg
            subdir = f"s_{int(subject_name[1]):02d}_seq_{int(seq_name[3]):02d}_ca_{int(cam):02d}"
            paths.extend(
                os.path.join(subdir, f"{subdir}_{i + 1:06d}.jpg")
                for i in range(n)
            )
            key = f"{subject_name} {seq_name} {cam}"
            names.append(key)
            seqi.extend([len(names) - 1] * n)
    return Mpi3dhpDataset(
        root=img_root,
        joints_3d=np.concatenate(j3),
        joints_2d=np.concatenate(j2),
        joints_2d_crop=np.concatenate(j2c),
        image_paths=np.asarray(paths),
        seq_idx=np.asarray(seqi, np.int32),
        seq_names=tuple(names),
    )


def load_test(npz_path: str, img_root: str) -> Mpi3dhpDataset:
    data = np.load(npz_path, allow_pickle=True)["data"].item()
    j3, j2, j2c, paths, seqi, names = [], [], [], [], [], []
    for seq in sorted(data.keys()):  # TS1..TS6
        anim = data[seq]
        valid = np.asarray(anim["valid"]).astype(bool).reshape(-1)
        w, h = (1920, 1080) if seq in ("TS5", "TS6") else (2048, 2048)
        j3.append(_center_3d(anim["data_3d"])[valid])
        j2.append(
            normalize_screen_coordinates(
                anim["data_2d"][..., :2].astype(np.float32), w, h
            ).astype(np.float32)[valid]
        )
        j2c.append(anim["data_2d_crop"][..., :2].astype(np.float32)[valid])
        frame_ids = np.nonzero(valid)[0]
        paths.extend(
            os.path.join(seq, f"{seq}_{i + 1:06d}.jpg") for i in frame_ids
        )
        names.append(seq)
        seqi.extend([len(names) - 1] * int(valid.sum()))
    return Mpi3dhpDataset(
        root=img_root,
        joints_3d=np.concatenate(j3),
        joints_2d=np.concatenate(j2),
        joints_2d_crop=np.concatenate(j2c),
        image_paths=np.asarray(paths),
        seq_idx=np.asarray(seqi, np.int32),
        seq_names=tuple(names),
    )


def export_inference_mat(
    path: str,
    preds_mm: np.ndarray,  # (N, 17, 3) root-zeroed predictions in mm
    seq_idx: np.ndarray,
    seq_names: tuple[str, ...],
) -> None:
    """Write `inference_data.mat` in the layout the vendored MATLAB scripts
    expect: per-seq (3, 17, 1, nf) arrays (run_3dhp.py:123-148 transposes each
    (17,3) pose to (3,17) and stacks on the last axis)."""
    import scipy.io as scio

    out = {}
    for i, name in enumerate(seq_names):
        p = preds_mm[seq_idx == i]  # (nf, 17, 3)
        out[name] = np.ascontiguousarray(
            p.transpose(2, 1, 0)[:, :, None, :]
        )
    scio.savemat(path, out)
