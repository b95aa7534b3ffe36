"""One process of the 2-process Trainer test (tests/test_multiprocess.py).

Runs the synthetic tiny H36M driver end to end under jax.distributed:
dataset sharding by process, one short train epoch, allgather'd evaluation.
Prints "P1RESULT <p1_mm>" — the parent asserts both processes agree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from contextaware_poseformer_tpu.train import train_h36m

    summary = None
    # --eval path: deterministic params (init only), so both processes'
    # gathered metrics must match bit-for-bit
    import jax.numpy as jnp  # noqa: F401

    args = [
        "--synthetic", "--tiny", "--batch-size", "8", "--eval",
        "--eval-batches", "2", "--logdir", "",
        "--distributed", "--coordinator", f"localhost:{port}",
        "--num-processes", str(nproc), "--process-id", str(pid),
    ]
    summary = train_h36m.main(args)
    print(f"P1RESULT {summary['p1_mm']:.9f}", flush=True)


if __name__ == "__main__":
    main()
