"""A/B: Pallas sampler backward vs the reference (gather-VJP) backward in
the FULL train step, interleaved in one process with device-trace durations.

The Pallas backward's justification (ops/deformable.py:504-511) is that the
gather-VJP's dF lowers to XLA scatter-adds which serialize on TPU; this
measures whether that holds in the real train step (flagship parity config,
both backwards traced into separate jitted step functions in ONE process —
wall-clock A/B across processes is invalid on the shared chip, PERF.md).

Run ALONE on the real TPU: python experiments/sampler_bwd_ab.py [--batch 128]
"""
import argparse
import glob
import gzip
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.ops import deformable as D
    from contextaware_poseformer_tpu.train import steps

    print("backend:", jax.default_backend())
    bs = args.batch
    cfg = cfglib.preset("h36m_hrnet_32")
    cfg = cfglib.replace(cfg, train=cfglib.replace(cfg.train, batch_size=bs))
    h, w = cfg.model.image_shape
    rng = np.random.RandomState(0)

    model = ContextAwarePoseFormer(cfg=cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=100)

    imgs = jnp.asarray(rng.randint(0, 256, (bs, h, w, 3)).astype(np.uint8))
    k3 = jnp.asarray(rng.randn(bs, 17, 3).astype(np.float32) * 0.3)
    k2 = jnp.asarray(rng.uniform(-1, 1, (bs, 17, 2)).astype(np.float32))
    kc = jnp.asarray(rng.uniform(0, w, (bs, 17, 2)).astype(np.float32))
    batch = steps.RawBatch(imgs, k3, k2, kc)
    key = jax.random.PRNGKey(0)
    state = steps.init_state(model, cfg, opt, jax.random.PRNGKey(1), batch)

    # Two jitted step functions traced under different _BWD_IMPL values.
    # _BWD_IMPL is read at TRACE time (inside the custom VJP), so pinning it
    # around the first call bakes the chosen backward into each graph.
    fns = {}
    for name, impl in (("step_ref", "reference"), ("step_pallas", "pallas")):
        D._BWD_IMPL = impl

        def step(s, b, impl=impl):
            return steps.make_train_step(model, cfg, opt)(s, b, key)

        step.__name__ = name
        f = jax.jit(step)
        try:
            out = f(state, batch)  # trace + compile now, under this impl
            jax.block_until_ready(out)
            fns[name] = f
        except Exception as e:  # noqa: BLE001 — e.g. scoped-VMEM OOM
            print(f"{name} ({impl}) FAILED to compile/run: "
                  f"{type(e).__name__}: {str(e)[:300]}")
    D._BWD_IMPL = "reference"
    if not fns:
        return

    # numerical agreement of one step (losses should match closely)
    losses = {}
    for name, f in fns.items():
        losses[name] = float(f(state, batch)[1]["loss"])
    print("losses:", {k: f"{v:.6f}" for k, v in losses.items()})

    tmp = tempfile.mkdtemp(prefix="sbwdab_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(args.iters):
        salt = steps.RawBatch(
            batch.images_u8, batch.keypoints_3d + jnp.float32(i) * 1e-6,
            batch.keypoints_2d, batch.keypoints_2d_crop,
        )
        for f in fns.values():
            outs.append(f(state, salt)[1]["loss"])
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()

    files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    agg = {}
    scatter = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            nm = e.get("name", "")
            for key_ in fns:
                if key_ in nm:
                    agg.setdefault(key_, []).append(e["dur"])
            if "scatter" in nm.lower():
                scatter.setdefault(nm[:60], []).append(e["dur"])
    print(f"\nfull train step, batch {bs} (device us/iter over "
          f"{args.iters} iters):")
    for key_ in fns:
        v = agg.get(key_, [])
        tot = np.sum(v) / args.iters if v else float("nan")
        print(f"  {key_}: {tot:9.1f} us/iter ({len(v)} events)")
    if scatter:
        print("\nscatter ops (the lever's target):")
        for nm, v in sorted(scatter.items(),
                            key=lambda kv: -np.sum(kv[1]))[:8]:
            print(f"  {np.sum(v) / args.iters:9.1f} us/iter  {nm}")
    # full per-op table: where the step actually goes
    ops = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            nm = e.get("name", "")
            if any(k in nm for k in fns):
                continue  # skip the module-level spans
            ops.setdefault(nm, []).append(e["dur"])
    print("\ntop device ops (us/iter, aggregated over all steps):")
    rows = sorted(ops.items(), key=lambda kv: -np.sum(kv[1]))[:30]
    for nm, v in rows:
        print(f"  {np.sum(v) / (args.iters * len(fns)):9.1f} x{len(v):<4d} {nm[:70]}")


if __name__ == "__main__":
    main()
