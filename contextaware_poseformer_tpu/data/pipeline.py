"""Host-side batch pipeline: threaded decode/crop + prefetched device_put.

Replaces the reference's 14-worker torch DataLoader + CUDA side-stream
prefetcher (ContextPose/train.py:49-120, mvn/datasets/utils.py:15-89) with a
thread pool filling fixed-shape numpy buffers and a small prefetch queue of
device-resident RawBatches. All math that the prefetcher did on GPU
(normalize/flip/center) lives in the jit'd step instead (train/steps.py), so
the host's only job is jpeg decode + affine crop + memcpy.

Fixed shapes always: train drops the remainder (shuffled anyway); eval pads
the final batch and reports `valid`, which the evaluator trims — the
functional analog of the reference's padded all_gather + dist_size trim
(train.py:216-226).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Protocol

import numpy as np

from contextaware_poseformer_tpu.train.steps import RawBatch


class ItemDataset(Protocol):
    def __len__(self) -> int: ...
    def load_image(self, idx: int) -> np.ndarray: ...

    joints_3d: np.ndarray
    joints_2d: np.ndarray
    joints_2d_crop: np.ndarray
    image_shape: tuple[int, int]


def _assemble(ds: ItemDataset, idxs: np.ndarray, pool: ThreadPoolExecutor,
              pad_to: int | None = None) -> tuple[RawBatch, int]:
    h, w = ds.image_shape
    n = len(idxs)
    total = pad_to or n
    batch_imgs = getattr(ds, "load_batch", lambda _i: None)(idxs)
    if batch_imgs is not None:  # native C++ path: one GIL-free call
        if total == n:
            images = batch_imgs
        else:
            images = np.zeros((total, h, w, 3), np.uint8)
            images[:n] = batch_imgs
    else:
        images = np.zeros((total, h, w, 3), np.uint8)
        for i, img in zip(range(n), pool.map(ds.load_image, idxs)):
            images[i] = img

    def pad(a):
        if total == n:
            return a
        out = np.zeros((total, *a.shape[1:]), a.dtype)
        out[:n] = a
        return out

    batch = RawBatch(
        images_u8=images,
        keypoints_3d=pad(ds.joints_3d[idxs].astype(np.float32)),
        keypoints_2d=pad(ds.joints_2d[idxs].astype(np.float32)),
        keypoints_2d_crop=pad(ds.joints_2d_crop[idxs].astype(np.float32)),
    )
    return batch, n


def batch_iterator(
    ds: ItemDataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    epoch: int = 0,
    drop_remainder: bool = True,
    num_workers: int = 8,
) -> Iterator[tuple[RawBatch, int]]:
    """Yields (host RawBatch, valid_count)."""
    n = len(ds)
    order = np.arange(n)
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size:
                if drop_remainder:
                    return
                yield _assemble(ds, idxs, pool, pad_to=batch_size)
                return
            yield _assemble(ds, idxs, pool)


def device_prefetch(
    host_iter: Iterator[tuple[RawBatch, int]],
    put: Callable[[RawBatch], RawBatch],
    depth: int = 2,
) -> Iterator[tuple[RawBatch, int]]:
    """Overlap host assembly + H2D transfer with device compute: a daemon
    thread keeps `depth` device-resident batches queued (the jax analog of the
    prefetcher's side CUDA stream, datasets/utils.py:18,39-41,86-88)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def producer():
        try:
            for batch, valid in host_iter:
                q.put((put(batch), valid))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
