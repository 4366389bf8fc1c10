"""Measure cross-program layout matching at the eval forward->decode seam.

The K=20 eval runs as TWO compiled programs (steps.make_eval_step): the
encoder features and sampled waypoints cross a jit boundary in default
(row-major) device layouts, and each program pays data-formatting copies
to convert between those defaults and the layouts XLA prefers internally
(~4 ms of the eval profile per the round-2 xprof campaign, ROADMAP).

jax's layout API can remove the boundary copies: compile the consumer
(decode_and_score) with AUTO input layouts so XLA picks its preferred
layout for every feature map, then pin the producer's (forward) output
layouts to exactly those — the arrays then flow across the boundary with
no relayout on either side.

Usage: python benchmarks/layout_boundary.py [n_iter]
Prints one JSON line with baseline vs layout-matched eval rates.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_iter=20, compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format
    from jax._src.layout import AutoLayout

    import bench

    from mst_tpu.train import steps as steps_lib

    # NO persistent compilation cache here: this jax version's cache key
    # ignores out_shardings layout pins, so a warm cache hands back an
    # executable with DEFAULT output layouts and the matched pipeline
    # fails its input-layout check (observed: fwd_pinned outputs came back
    # (0,1,2,3) row-major after a cached rerun). A blocker for shipping
    # layout matching in the production eval path, fine for measurement.
    jax.config.update("jax_compilation_cache_dir", None)

    mcfg, params, state, scfg, batch, sc = bench.build_scenario(
        "sdd", compute_dtype)
    key = jax.random.PRNGKey(0)
    hom = jnp.eye(3, dtype=jnp.float32)

    eval_step = steps_lib.make_eval_step(mcfg, scfg)

    def timed(fn, label):
        out = fn(0)
        jax.block_until_ready(out["ade"])
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = fn(i)
        jax.block_until_ready(out["ade"])
        tps = sc["B"] * n_iter / (time.perf_counter() - t0)
        print(f"[layout] {label}: {tps:.2f} traj/s", file=sys.stderr,
              flush=True)
        return tps, out

    # ---- baseline: the shipped two-program pipeline
    base_tps, base_out = timed(
        lambda i: eval_step(params, state, batch,
                            jax.random.fold_in(key, i)),
        "baseline two-program")

    # ---- layout-matched pipeline
    fwd, dec = eval_step.forward, eval_step.decode_and_score
    fwd_fn, dec_fn = fwd.__wrapped__, dec.__wrapped__

    # 1. consumer with AUTO layouts on the boundary args (features +
    #    waypoint_samples); everything else stays default
    fwd_abstract = jax.eval_shape(fwd, params, state, batch, key)
    auto = jax.tree.map(lambda _: Format(AutoLayout()), fwd_abstract)
    dec_auto = jax.jit(
        dec_fn,
        in_shardings=(None, auto[0], auto[1], None, None, None))
    dec_c = dec_auto.lower(params, fwd_abstract[0], fwd_abstract[1],
                           batch["traj"], batch["mask"], hom).compile()
    in_formats = dec_c.input_formats[0]
    feat_formats, wp_format = in_formats[1], in_formats[2]
    print(f"[layout] decode chose: "
          f"{[f.layout.major_to_minor for f in feat_formats]} wp="
          f"{wp_format.layout.major_to_minor}", file=sys.stderr, flush=True)

    # 2. producer pinned to the consumer's chosen layouts
    fwd_pinned = jax.jit(fwd_fn, out_shardings=(feat_formats, wp_format))
    fwd_c = fwd_pinned.lower(params, state, batch, key).compile()

    def matched(i):
        f, w = fwd_c(params, state, batch, jax.random.fold_in(key, i))
        return dec_c(params, f, w, batch["traj"], batch["mask"], hom)

    match_tps, match_out = timed(matched, "layout-matched")

    np.testing.assert_allclose(np.asarray(base_out["ade"]),
                               np.asarray(match_out["ade"]),
                               rtol=2e-2, atol=2e-2)

    result = {
        "metric": "layout_boundary_eval_traj_per_sec",
        "baseline": round(base_tps, 3),
        "layout_matched": round(match_tps, 3),
        "speedup": round(match_tps / base_tps, 4),
        "device": jax.devices()[0].device_kind,
        "compute_dtype": compute_dtype,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    measure(n_iter=int(sys.argv[1]) if len(sys.argv) > 1 else 20)
