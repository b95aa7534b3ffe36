"""Host input pipeline under REAL JPEG traffic (VERDICT round-1 item 2).

Generates a disk fixture of actual JPEG files (blurred-noise content at
JPEG q85 — realistic entropy, between flat synthetic and worst-case noise),
builds a real H36MDataset over them, and runs the production
data/pipeline.batch_iterator at the reference train batch size (512,
ContextPose/experiments/human36m/train/human36m.yaml:72) in both regimes:

  full   1000x1000 source frames -> imread + warpAffine crop (train path)
  crop   192x256 precropped      -> imread only (serving path)
  store  packed raw-frame memmap -> zero decode (data/frame_store.py,
         VERDICT r3 item 5; loader column is moot — one mmap fancy-index)

and both loaders (cv2 thread pool / native C++ libjpeg loader,
CAPF_NATIVE_LOADER=1). Prints sustained images/sec and the host-core count
needed to keep a 61 ms/step device budget fed (batch 512 / 61 ms = 8,393
img/s). NOTE this VM has ONE core — the per-core rate is the result; the
reference trains with 14 DataLoader workers (train.py:111).

Usage: python experiments/host_pipeline_bench.py [--regimes full,crop]
       [--loaders cv2,native] [--batches 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

FIXTURE = "/tmp/capf_jpeg_fixture"
N_FULL, FULL_HW = 1024, (1000, 1000)
N_CROP, CROP_HW = 2048, (256, 192)
BATCH = 512
DEVICE_STEP_MS = 61.0  # reference-equivalent device step at batch 512


def make_fixture():
    import cv2

    rng = np.random.RandomState(7)
    os.makedirs(f"{FIXTURE}/full", exist_ok=True)
    os.makedirs(f"{FIXTURE}/crop", exist_ok=True)
    done = f"{FIXTURE}/.done"
    if os.path.exists(done):
        return
    t0 = time.time()
    for n, hw, sub in ((N_FULL, FULL_HW, "full"), (N_CROP, CROP_HW, "crop")):
        for i in range(n):
            img = rng.randint(0, 256, (*hw, 3), np.uint8)
            img = cv2.GaussianBlur(img, (0, 0), 3)
            cv2.imwrite(f"{FIXTURE}/{sub}/{i:06d}.jpg", img,
                        [cv2.IMWRITE_JPEG_QUALITY, 85])
    open(done, "w").write("ok")
    print(f"fixture built in {time.time() - t0:.1f}s")


def make_ds(regime):
    from contextaware_poseformer_tpu.data.h36m import H36MDataset

    n = N_FULL if regime == "full" else N_CROP
    sub = "full" if regime == "full" else "crop"
    paths = np.asarray([f"{sub}/{i:06d}.jpg" for i in range(n)])
    z = lambda *s: np.zeros((n, *s), np.float32)  # noqa: E731
    center = np.full((n, 2), 500.0, np.float32)
    scale = np.full((n, 2), 2.0, np.float32)  # 400px box @ scale*200
    ds = H36MDataset(
        root=FIXTURE, joints_3d=z(17, 3), joints_2d=z(17, 2),
        joints_2d_crop=z(17, 2), center=center, scale=scale,
        action_idx=np.zeros(n, np.int32), subject_idx=np.zeros(n, np.int32),
        video_idx=np.zeros(n, np.int64), image_paths=paths,
        image_shape=(256, 192), precropped=(regime != "full"),
    )
    if regime == "store":
        from contextaware_poseformer_tpu.data import frame_store

        store_path = f"{FIXTURE}/frames.npy"
        if not os.path.exists(store_path):
            t0 = time.time()
            frame_store.build_store(ds, store_path, log=None)
            print(f"  store built in {time.time() - t0:.1f}s")
        ds.frame_store = frame_store.open_store(store_path, (256, 192))
        ds.store_idx = np.arange(n, dtype=np.int64)
    return ds


def run(regime, loader, n_batches, workers):
    os.environ["CAPF_NATIVE_LOADER"] = "1" if loader == "native" else "0"
    from contextaware_poseformer_tpu.data import native_loader
    from contextaware_poseformer_tpu.data.pipeline import batch_iterator

    if loader == "native" and not native_loader.buildable():
        print(f"  {regime}/{loader}: native loader unavailable "
              f"({native_loader._build_error})")
        return None
    ds = make_ds(regime)
    # warm one batch (thread pool spin-up, page cache, native lib dlopen)
    it = batch_iterator(ds, BATCH, shuffle=True, seed=0, num_workers=workers)
    next(it)
    t0 = time.time()
    seen = 0
    epoch = 1
    it = batch_iterator(ds, BATCH, shuffle=True, seed=1, num_workers=workers)
    while seen < n_batches * BATCH:
        try:
            batch, valid = next(it)
        except StopIteration:
            epoch += 1
            it = batch_iterator(ds, BATCH, shuffle=True, seed=epoch,
                                num_workers=workers)
            continue
        assert batch.images_u8.shape == (BATCH, 256, 192, 3)
        seen += valid
    dt = time.time() - t0
    rate = seen / dt
    need = BATCH / (DEVICE_STEP_MS / 1e3)
    print(f"  {regime:4s}/{loader:6s}: {rate:8.1f} img/s "
          f"({dt / (seen / BATCH) * 1e3:6.1f} ms/batch-512)  "
          f"cores to feed 61ms device step: {need / rate:.1f}")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", default="full,crop")
    ap.add_argument("--loaders", default="cv2,native")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()
    make_fixture()
    print(f"nproc={os.cpu_count()}  batch={BATCH}  "
          f"target={BATCH / DEVICE_STEP_MS * 1e3:.0f} img/s")
    for regime in args.regimes.split(","):
        for loader in args.loaders.split(","):
            run(regime, loader, args.batches, args.workers)


if __name__ == "__main__":
    main()
