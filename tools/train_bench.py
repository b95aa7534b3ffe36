"""Training-step throughput on the real TPU (sustained, honest timing).

Measures the FULL jitted train step (forward incl. frozen backbone,
losses, backward through the lifter, AdamW masked update, NaN guard) of
the flagship parity config at production image shape (256x192), reporting
steps/s and frames/s per chip. The reference envelope is batch 512 on an
RTX 3090 (human36m.yaml:72); v5e HBM is 16 GB so the default here sweeps
batch 64/128/256.

    python tools/train_bench.py [--batches 64,128,256] [--preset h36m_hrnet_32]

Wall time ~10-20 min through the tunnel (one compile per batch size).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="h36m_hrnet_32")
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bursts", type=int, default=3)
    ap.add_argument(
        "--eval", action="store_true",
        help="also time the eval step (flip-test folded into the batch axis "
        "— one 2B forward) at each batch size",
    )
    ap.add_argument(
        "--compute-dtype", default=None, choices=["float32", "bfloat16"],
        help="override ModelConfig.compute_dtype (bfloat16 = fast-train: "
        "frozen backbone in bf16, lifter/optimizer stay fp32 — the same "
        "switch Trainer honors via cfg.model.compute_dtype)",
    )
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.train import steps
    from contextaware_poseformer_tpu.utils.profiling import sustained_timer

    print("backend:", jax.default_backend())
    cfg = cfglib.preset(args.preset)
    if args.compute_dtype:
        cfg = cfglib.replace(
            cfg, model=cfglib.replace(cfg.model, compute_dtype=args.compute_dtype)
        )
    model_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    )
    h, w = cfg.model.image_shape
    rng = np.random.RandomState(0)

    for bs in [int(b) for b in args.batches.split(",")]:
        cfg_b = cfglib.replace(
            cfg, train=cfglib.replace(cfg.train, batch_size=bs)
        )
        model = ContextAwarePoseFormer(cfg=cfg_b.model, dtype=model_dtype)
        opt = steps.make_optimizer(cfg_b, steps_per_epoch=100)
        train_step = jax.jit(steps.make_train_step(model, cfg_b, opt), donate_argnums=0)

        imgs = jnp.asarray(
            rng.randint(0, 256, (bs, h, w, 3)).astype(np.uint8))
        k3 = jnp.asarray(rng.randn(bs, 17, 3).astype(np.float32) * 0.3)
        k2 = jnp.asarray(rng.uniform(-1, 1, (bs, 17, 2)).astype(np.float32))
        kc = jnp.asarray(
            rng.uniform(0, w, (bs, 17, 2)).astype(np.float32))
        batch = steps.RawBatch(imgs, k3, k2, kc)
        key = jax.random.PRNGKey(0)
        try:
            state = steps.init_state(
                model, cfg_b, opt, jax.random.PRNGKey(1), batch)
        except Exception as e:  # noqa: BLE001 — report OOM per batch size
            print(f"batch {bs}: init failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue

        holder = {"state": state}

        def step_once(salt):
            s, aux = train_step(
                holder["state"],
                steps.RawBatch(
                    batch.images_u8,
                    batch.keypoints_3d + salt,
                    batch.keypoints_2d,
                    batch.keypoints_2d_crop,
                ),
                key,
            )
            holder["state"] = s
            return aux["loss"]

        try:
            r = sustained_timer(
                step_once,
                lambda i: (jnp.float32(i) * 1e-6,),
                iters=args.iters, bursts=args.bursts,
            )
        except Exception as e:  # noqa: BLE001
            print(f"batch {bs}: step failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(
            f"batch {bs}: {r['sec_per_iter'] * 1e3:.1f} ms/step, "
            f"{r['iters_per_sec']:.2f} steps/s, "
            f"{bs * r['iters_per_sec']:.0f} frames/s/chip"
        )

        if args.eval:
            eval_step = jax.jit(steps.make_eval_step(model, cfg_b))
            params = holder["state"].params

            def eval_once(salt):
                pred, _ = eval_step(
                    params,
                    steps.RawBatch(
                        batch.images_u8,
                        batch.keypoints_3d,
                        batch.keypoints_2d + salt,
                        batch.keypoints_2d_crop,
                    ),
                )
                return pred

            try:
                r = sustained_timer(
                    eval_once,
                    lambda i: (jnp.float32(i) * 1e-9,),
                    iters=args.iters, bursts=args.bursts,
                )
            except Exception as e:  # noqa: BLE001
                print(f"batch {bs}: eval failed: {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            print(
                f"batch {bs} EVAL (flip-test 2B fwd): "
                f"{r['sec_per_iter'] * 1e3:.1f} ms/step, "
                f"{bs * r['iters_per_sec']:.0f} frames/s/chip"
            )


if __name__ == "__main__":
    main()
