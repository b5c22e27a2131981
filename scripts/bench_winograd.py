"""Standalone Winograd-vs-direct 3x3 conv bench at UNet ResBlock shapes.

fori_loop + scalar-fetch methodology (see bench.py). Also verifies
on-device parity vs the direct conv at each shape.

Usage: python scripts/bench_winograd.py [--iters 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

SHAPES = [  # (B, H, W, C, F) — flagship UNet ResBlock conv shapes
    (32, 32, 32, 128, 128),   # level0
    (32, 16, 16, 256, 256),   # level1
    (32, 8, 8, 384, 384),     # level2 (C%128=0)
    (32, 4, 4, 512, 512),     # level3
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.ops.winograd_conv import (
        _direct_conv, winograd_conv3x3, winograd_supported)

    for (B, H, W, C, F) in SHAPES:
        if not winograd_supported((B, H, W, C), F):
            print(f"B{B} {H}x{W} C{C}->F{F}: unsupported, skipped")
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, F),
                               jnp.float32) * (C * 9) ** -0.5)

        # on-device parity
        try:
            y = winograd_conv3x3(x, w)
            yr = _direct_conv(x.astype(jnp.float32), w)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - yr)))
            sc = float(jnp.max(jnp.abs(yr)))
        except Exception as e:
            print(f"B{B} {H}x{W} C{C}->F{F}: COMPILE FAILED: "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
            continue

        def timer(fn):
            @jax.jit
            def chain(x, w, iters):
                def body(i, x):
                    y = fn(x, w)
                    return y.astype(x.dtype)
                return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0, 0]

            float(chain(x, w, 1))
            float(chain(x, w, args.iters + 1))

            def best(n, tries=5):
                ts = []
                for _ in range(tries):
                    t0 = time.perf_counter()
                    float(chain(x, w, n))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            return (best(args.iters + 1) - best(1)) / args.iters

        t_wino = timer(lambda x, w: winograd_conv3x3(x, w))
        t_dir = timer(lambda x, w: _direct_conv(x, w))
        flops = 2 * B * H * W * 9 * C * F
        print(f"B{B} {H}x{W} C{C}->F{F}: wino {t_wino*1e6:7.1f}us "
              f"direct {t_dir*1e6:7.1f}us  win {(t_dir-t_wino)*1e6:+7.1f}us"
              f"  direct_mfu {flops/t_dir/197e12*100:4.1f}%"
              f"  parity {err:.3e}/{sc:.2e}")


if __name__ == "__main__":
    main()
