"""XLA/libtpu compiler-flag sweep over bench.py (single TPU chip).

Each flag set runs bench.py in a fresh subprocess (flags are read at
backend init). Prints steps/s per flag set; flags that do not propagate
through the device tunnel simply reproduce the baseline number.

Usage: python scripts/bench_xla_flags.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEPS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_rewriter": "--xla_tpu_enable_dot_strength_reduction=false",
}


def main():
    for name, flags in SWEEPS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " +
                                flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env, capture_output=True, text=True, timeout=560)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if line:
                rec = json.loads(line[-1])
                print(f"{name:<14} {rec['value']:8.1f} steps/s "
                      f"(vs_baseline {rec['vs_baseline']})")
            else:
                err = (out.stderr or "").strip().splitlines()
                print(f"{name:<14} FAILED: {err[-1] if err else 'no output'}")
        except subprocess.TimeoutExpired:
            print(f"{name:<14} TIMEOUT")


if __name__ == "__main__":
    main()
