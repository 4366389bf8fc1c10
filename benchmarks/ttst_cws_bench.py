"""Measure the TTST and CWS eval legs on the real TPU.

The shipped parity configs run with both tricks off (the bench's headline
legs match that), but TTST and CWS are where the reference's eval is most
loop-bound: TTST samples 10,000 goals and k-means-clusters them PER
PERSON in a Python loop (reference utils/evaluate.py:134-161,
utils/kmeans.py:22-108), and CWS builds an oriented Gaussian prior PER
GOAL per waypoint (evaluate.py:172-226). Here both run as batched device
code (ops/kmeans.py lax.while_loop over (B, 10000, 2); vectorized
cws_gaussian_prior), so this measures what they cost ON TOP of the plain
eval step.

Run on the TPU:  python benchmarks/ttst_cws_bench.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mst_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench
from mst_tpu.train import steps as steps_lib


def measure(label, scenario, n_iter, **scfg_overrides):
    mcfg, params, state, scfg, batch, sc = bench.build_scenario(
        scenario, "bfloat16", **scfg_overrides)
    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    key = jax.random.PRNGKey(0)
    out = eval_step(params, state, batch, key)
    jax.block_until_ready(out["ade"])
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = eval_step(params, state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(out["ade"])
    tps = sc["B"] * n_iter / (time.perf_counter() - t0)
    print(f"{label:34s} {tps:7.1f} traj/s "
          f"({1e3 * sc['B'] / tps:.1f} ms/batch of {sc['B']})")
    return tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    base = measure("sdd eval (TTST/CWS off, shipped)", "sdd", args.iters)
    ttst = measure("sdd eval + TTST (10k goal k-means)", "sdd", args.iters,
                   use_ttst=True, rel_threshold=0.01)
    ind = measure("ind eval (2 waypoints, shipped)", "ind", args.iters)
    cws = measure("ind eval + CWS (oriented prior)", "ind", args.iters,
                  use_cws=True,
                  cws_params=dict(sigma_factor=6, ratio=2, rot=True))
    print(f"TTST overhead: {100 * (base / ttst - 1):.1f}% of the plain "
          f"sdd eval; CWS overhead: {100 * (ind / cws - 1):.1f}% of the "
          f"plain ind eval")


if __name__ == "__main__":
    main()
