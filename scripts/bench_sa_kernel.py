"""Micro-benchmark: fused Pallas slot-attention kernel vs the XLA path.

Times the full SA refinement (k/v given) at the reference's flagship video
scale by default: B=32 frames, N=1024 tokens (128px, stride-4 ResNet18
encoder), S=15 slots x 192-d, 2 iterations
(savi_ldm_movie_params-res128.py:44-57).

Uses the only trustworthy timing method on the tunneled TPU: chain the op
inside one jitted lax.fori_loop and fetch a scalar (see bench.py docstring).

Usage: python scripts/bench_sa_kernel.py [--B 32] [--N 1024] [--S 15]
       [--D 192] [--iters 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--S", type=int, default=15)
    ap.add_argument("--D", type=int, default=192)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.ops.slot_attention_kernel import (
        sa_iterations_pallas, sa_iterations_ref)

    B, N, S, D = args.B, args.N, args.S, args.D
    M = 2 * D
    r = np.random.RandomState(0)
    g = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32) * 0.2)
    p = {"wq": g(D, D), "ln_q_scale": jnp.ones((D,)),
         "ln_q_bias": g(D) * 0.1, "gru_wi": g(D, 3 * D),
         "gru_wh": g(D, 3 * D), "gru_bh": g(3 * D) * 0.1,
         "ln_mlp_scale": jnp.ones((D,)), "ln_mlp_bias": g(D) * 0.1,
         "w1": g(D, M), "b1": g(M) * 0.1, "w2": g(M, D), "b2": g(D) * 0.1}
    k = g(B, N, D) * 5.0
    v = g(B, N, D) * 5.0
    slots = g(B, S, D) * 5.0

    def bench(fn_one, label):
        @jax.jit
        def chain(k, v, slots, reps):
            def body(i, s):
                out = fn_one(k, v, s)
                # re-inject to keep the loop data-dependent
                return s * 0.5 + out * 0.5

            return jax.lax.fori_loop(0, reps, body, slots)[0, 0, 0]

        float(chain(k, v, slots, 1))
        float(chain(k, v, slots, args.reps + 1))

        def best(reps, tries=5):
            ts = []
            for _ in range(tries):
                t0 = time.perf_counter()
                float(chain(k, v, slots, reps))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (best(args.reps + 1) - best(1)) / args.reps
        print(f"{label}: {per * 1e6:.1f} us/refinement "
              f"({B / per:.0f} frames/s)")
        return per

    xla = bench(lambda k, v, s: sa_iterations_ref(
        k, v, s, p, num_iterations=args.iters, eps=1e-6), "xla       ")
    pal = bench(lambda k, v, s: sa_iterations_pallas(
        k, v, s, p, num_iterations=args.iters, eps=1e-6), "pallas    ")
    print(f"speedup: {xla / pal:.2f}x")


if __name__ == "__main__":
    main()
