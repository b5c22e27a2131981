"""Pod-scale AOT sharding validation (no TPU pod required).

Compiles the flagship SlotDiffusion train step for detached TPU pod
topologies via jax.experimental.topologies and reports per-chip memory
under DP, DP x TP, and DP + FSDP (ZeRO-3) — see parallel/aot.py.
Asserts the FSDP layout actually cuts per-chip param+optimizer+EMA state
vs pure DP (the ZeRO-3 contract), and that TP shards param leaves.

Usage (CPU host is fine — nothing executes on TPUs):
    python scripts/aot_scaling.py \
        --params configs/video_based/savi_ldm/savi_ldm_movie_params-res128.py \
        --topos v5e:2x4,v5e:4x4,v5e:4x8 \
        --out docs/aot_scaling.json

Reference contract: SURVEY.md §2.3; the reference's own scaling evidence
is run-it-and-see DDP (/root/reference/scripts/train.py:87-110).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sizing host; no live TPU needed

from slotdiffusion_tpu.parallel import aot  # noqa: E402
from slotdiffusion_tpu.utils.config import load_params  # noqa: E402


def run_matrix(params_path, topos, per_replica_batch, plan_filter,
               jsonl_path):
    """One compile per (topology, plan); each finished row is appended to
    `jsonl_path` immediately (a flagship-scale AOT compile is ~45 min on
    this 1-core host, so partial progress must survive a kill) and rows
    already present there are skipped on rerun."""
    done = {}
    if jsonl_path and os.path.exists(jsonl_path):
        with open(jsonl_path) as f:
            for line in f:
                r = json.loads(line)
                done[(r["topology"], r["plan_kind"])] = r
    rows = []
    for topo in topos:
        n = len(aot.topology_devices(topo))
        plans = [("dp", dict(model_axis=1, fsdp=False))]
        if n >= 4:
            plans.append(("tp2", dict(model_axis=2, fsdp=False)))
        plans.append(("fsdp", dict(model_axis=1, fsdp=True)))
        for kind, plan in plans:
            if plan_filter and kind not in plan_filter:
                continue
            if (topo, kind) in done:
                rows.append(done[(topo, kind)])
                print(f"[{topo} {kind}] cached from {jsonl_path}",
                      flush=True)
                continue
            cfg = load_params(params_path)  # fresh copy per compile
            t0 = time.time()
            rep = aot.compile_train_step(
                cfg, topo, per_replica_batch=per_replica_batch, **plan)
            rep["compile_s"] = round(time.time() - t0, 1)
            rep["plan_kind"] = kind
            rows.append(rep)
            if jsonl_path:
                with open(jsonl_path, "a") as f:
                    f.write(json.dumps(rep) + "\n")
            print(f"[{topo} {rep['plan']}] state/chip="
                  f"{rep['state_per_chip'] / 1024**2:.1f}MB temp/chip="
                  f"{rep['temp_per_chip'] / 1024**2:.1f}MB peak="
                  f"{rep['peak_per_chip'] / 1024**2:.1f}MB fits="
                  f"{rep['fits']} ({rep['compile_s']}s)", flush=True)
    return rows


def check_invariants(rows):
    """ZeRO-3 / TP sharding contracts, per topology."""
    by_topo = {}
    for r in rows:
        by_topo.setdefault(r["topology"], {})[r["plan"]] = r
    for topo, plans in by_topo.items():
        dp = next((r for p, r in plans.items()
                   if "tp" not in p and "fsdp" not in p), None)
        fsdp = next((r for p, r in plans.items() if "fsdp" in p), None)
        tp = next((r for p, r in plans.items() if "tp" in p), None)
        if dp and fsdp:
            assert fsdp["state_per_chip"] < 0.6 * dp["state_per_chip"], (
                f"{topo}: FSDP state/chip {fsdp['state_per_chip']} not "
                f"< 0.6x DP {dp['state_per_chip']} — ZeRO-3 layout did "
                f"not engage")
        if dp and tp:
            assert tp["params_per_chip"] < dp["params_per_chip"], (
                f"{topo}: TP params/chip not below DP — model axis "
                f"did not shard any leaf")
    print("invariants OK: FSDP cuts per-chip state <0.6x DP; "
          "TP shards params", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=(
        "configs/video_based/savi_ldm/savi_ldm_movie_params-res128.py"))
    ap.add_argument("--topos", default="v5e:2x4,v5e:4x4,v5e:4x8")
    ap.add_argument("--per_replica_batch", type=int, default=8)
    ap.add_argument("--out", default="docs/aot_scaling.json")
    ap.add_argument("--plans", default="",
                    help="comma filter of plan kinds (dp,tp2,fsdp); "
                         "empty = all")
    ap.add_argument("--no_invariants", action="store_true",
                    help="skip cross-plan asserts (partial matrix)")
    args = ap.parse_args()

    plan_filter = [p for p in args.plans.split(",") if p]
    rows = run_matrix(args.params, args.topos.split(","),
                      args.per_replica_batch, plan_filter,
                      args.out + "l")  # docs/aot_scaling.jsonl
    if not args.no_invariants:
        check_invariants(rows)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(aot.format_table(rows))


if __name__ == "__main__":
    main()
