"""Probe: does a CHAINED multi-conv Pallas kernel sustain the v2 rate?

pallas_conv_probe.py established that a single 3x3 conv as one x9 deep
dot per tile runs at 150-155 TF/s on the finest-decoder shape (vs 92.8
for the standalone XLA conv). The whole-finest-level route (ROADMAP
round-4 notes) additionally requires CHAINING stages inside one kernel
(conv -> relu -> conv -> relu -> predictor -> softargmax) with the
intermediate planes in VMEM scratch, so the (KB, 176, 240, 128)
activations never reach HBM. This probe measures exactly that pattern
at the real traj-decoder tail shapes:

  xq (KB, 176, 240, 64)  -> conv3x3 (64->128) + bias + relu   [stage A]
                         -> conv3x3 (128->128) + bias + relu  [stage B]
                         -> 1x1 predictor (128->4*12) + bias
                         -> packed online soft-argmax -> (KB, 12, 2)

Grid is (KB,); each step holds the whole (176, 240) plane: the stage-A
output lives in VMEM scratch, stage B + predictor + softargmax stats run
per h-tile in a Python-unrolled loop (static slice bounds, zero-pad
borders). Oracle: the same chain through XLA convs + softargmax2d_packed.

Run on TPU: python -m benchmarks.pallas_chain_probe
Correctness-only on CPU: python -m benchmarks.pallas_chain_probe --cpu
"""

import functools
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from mst_tpu.ops.pallas.fused_predict import unify_packed_stats  # noqa: E402

BH = 16  # rows per unrolled tile; Hp % BH == 0


def _x9(xt, bh, wp):
    """(bh+2, Wp, C) halo-extended tile -> (bh*Wp, 9C) shifted-tap concat."""
    z = jnp.zeros_like(xt[:, :1])
    xw = jnp.concatenate([z, xt, z], axis=1)  # (bh+2, Wp+2, C)
    c = xt.shape[2]
    return jnp.concatenate(
        [xw[dy:dy + bh, dx:dx + wp].reshape(bh * wp, c)
         for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=1)


def _halo_rows(plane, lo, hi, hp):
    """Rows [lo, hi) of a (Hp, Wp, C) plane value, zero-padded borders.

    lo/hi are static Python ints possibly out of [0, hp); out-of-range
    rows come back as zeros (SAME-conv border semantics). Takes a loaded
    VALUE, not a ref: Mosaic rejects memref slices whose lane dim is
    below the 128 tiling (e.g. C=64), value slices are fine.
    """
    core = plane[max(lo, 0):min(hi, hp)]
    pads = []
    if lo < 0:
        pads.append(jnp.zeros((-lo,) + core.shape[1:], core.dtype))
    pads.append(core)
    if hi > hp:
        pads.append(jnp.zeros((hi - hp,) + core.shape[1:], core.dtype))
    return jnp.concatenate(pads, axis=0) if len(pads) > 1 else core


def _kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wp_ref, bp_ref,
            o_ref, a_ref, *, bh, n_pred, stats=True):
    hp, wp_, _ = a_ref.shape
    nh = hp // bh
    dt = a_ref.dtype

    # ---- stage A: conv3x3(x, wa) + bias + relu -> scratch plane
    xv = x_ref[0]  # whole plane loaded once (C=64: refs can't be sliced)
    for t in range(nh):
        lo = t * bh
        xt = _halo_rows(xv, lo - 1, lo + bh + 1, hp)
        acc = jnp.dot(_x9(xt, bh, wp_), wa_ref[:],
                      preferred_element_type=jnp.float32) + ba_ref[0]
        a_ref[lo:lo + bh] = jax.nn.relu(acc).reshape(
            bh, wp_, -1).astype(dt)

    # ---- stage B + predictor + online packed softargmax stats
    n4 = 4 * n_pred
    m = jnp.full((1, n4), -jnp.inf, jnp.float32)
    s = jnp.zeros((1, n4), jnp.float32)
    sx = jnp.zeros((1, n4), jnp.float32)
    sy = jnp.zeros((1, n4), jnp.float32)
    for t in range(nh):
        lo = t * bh
        at = _halo_rows(a_ref, lo - 1, lo + bh + 1, hp)
        b = jnp.dot(_x9(at, bh, wp_), wb_ref[:],
                    preferred_element_type=jnp.float32) + bb_ref[0]
        b = jax.nn.relu(b).astype(dt)                   # (bh*Wp, 128)
        logits = jnp.dot(b, wp_ref[:],
                         preferred_element_type=jnp.float32) + bp_ref[0]
        if not stats:  # convs-only attribution mode: cheap reduction
            s = s + jnp.sum(logits, axis=0, keepdims=True)
            continue
        flat = jax.lax.broadcasted_iota(jnp.int32, (bh * wp_, n4), 0)
        jc = jnp.mod(flat, wp_).astype(jnp.float32)
        ic = (lo + jnp.floor_divide(flat, wp_)).astype(jnp.float32)
        new_m = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m - new_m)
        e = jnp.exp(logits - new_m)
        s = s * alpha + jnp.sum(e, axis=0, keepdims=True)
        sx = sx * alpha + jnp.sum(e * jc, axis=0, keepdims=True)
        sy = sy * alpha + jnp.sum(e * ic, axis=0, keepdims=True)
        m = new_m

    if not stats:
        o_ref[0, 0, :] = s[0, :n_pred]
        o_ref[0, 1, :] = s[0, n_pred:2 * n_pred]
        return

    # unify the 4 sub-position statistics (the production epilogue)
    tot_x, tot_y = unify_packed_stats(m, s, sx, sy, n_pred, 1e-6)
    o_ref[0, 0, :] = tot_x
    o_ref[0, 1, :] = tot_y


def _kernel_v2(x_mid, x_t2, x_t1, x_b1, x_b2, wa_ref, ba_ref, wb_ref,
               bb_ref, wp_ref, bp_ref, o_ref,
               m_ref, s_ref, sx_ref, sy_ref, *, bh, n_pred):
    """Streamed row-tile chain with local stage-A halo recompute.

    Grid is (KB, nh); tile h consumes x rows [h*bh-2, h*bh+bh+2) (the
    halo rows arrive as four 1-row streams, clamped + masked at the
    image borders, like pallas_conv_probe._kernel_v2), recomputes the
    stage-A rows its stage-B halo needs (bh+2 rows instead of bh: +12.5%
    of stage-A FLOPs at bh=16 = +4% of the chain) and accumulates the
    packed online-softargmax statistics in scratch across row-tiles, so
    NO intermediate plane ever exists — not even in a scratch buffer.
    """
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    mid = x_mid[0]                            # (bh, Wp, C)
    wp_, c = mid.shape[1], mid.shape[2]
    dt = mid.dtype
    live_t = (h > 0).astype(dt)
    live_b = (h < nh - 1).astype(dt)
    top = jnp.concatenate([x_t2[0] * live_t, x_t1[0] * live_t], axis=0)
    bot = jnp.concatenate([x_b1[0] * live_b, x_b2[0] * live_b], axis=0)
    xext = jnp.concatenate([top, mid, bot], axis=0)   # (bh+4, Wp, C)

    # ---- stage A for rows [h*bh-1, h*bh+bh+1): conv3x3 + bias + relu
    a = jnp.dot(_x9(xext, bh + 2, wp_), wa_ref[:],
                preferred_element_type=jnp.float32) + ba_ref[0]
    a = jax.nn.relu(a).reshape(bh + 2, wp_, -1).astype(dt)
    # zero the out-of-image halo rows (relu(bias) != 0 on zeroed input)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    mask = jnp.where(rows == 0, live_t, dt.type(1))
    mask = mask * jnp.where(rows == bh + 1, live_b, dt.type(1))
    a = a * mask

    # ---- stage B + predictor for rows [h*bh, h*bh+bh)
    n4 = 4 * n_pred
    b = jnp.dot(_x9(a, bh, wp_), wb_ref[:],
                preferred_element_type=jnp.float32) + bb_ref[0]
    b = jax.nn.relu(b).astype(dt)                     # (bh*Wp, CA)
    logits = jnp.dot(b, wp_ref[:],
                     preferred_element_type=jnp.float32) + bp_ref[0]

    # ---- online packed softargmax statistics across row-tiles
    @pl.when(h == 0)
    def _init():
        m_ref[:] = jnp.full((1, n4), -jnp.inf, jnp.float32)
        s_ref[:] = jnp.zeros((1, n4), jnp.float32)
        sx_ref[:] = jnp.zeros((1, n4), jnp.float32)
        sy_ref[:] = jnp.zeros((1, n4), jnp.float32)

    flat = jax.lax.broadcasted_iota(jnp.int32, (bh * wp_, n4), 0)
    jc = jnp.mod(flat, wp_).astype(jnp.float32)
    ic = (h * bh + jnp.floor_divide(flat, wp_)).astype(jnp.float32)
    m = m_ref[:]
    new_m = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
    alpha = jnp.exp(m - new_m)
    e = jnp.exp(logits - new_m)
    s_ref[:] = s_ref[:] * alpha + jnp.sum(e, axis=0, keepdims=True)
    sx_ref[:] = sx_ref[:] * alpha + jnp.sum(e * jc, axis=0, keepdims=True)
    sy_ref[:] = sy_ref[:] * alpha + jnp.sum(e * ic, axis=0, keepdims=True)
    m_ref[:] = new_m

    # ---- finalize on the last row-tile (o_ref block persists across h)
    @pl.when(h == nh - 1)
    def _finalize():
        tot_x, tot_y = unify_packed_stats(m_ref[:], s_ref[:], sx_ref[:],
                                          sy_ref[:], n_pred, 1e-6)
        o_ref[0, 0, :] = tot_x
        o_ref[0, 1, :] = tot_y


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def pallas_chain_v2(x, wa, ba, wb, bb, wpred, bpred, n_pred, bh=BH,
                    interpret=False):
    KB, Hp, Wp, C = x.shape
    Ca = wa.shape[3]
    assert Hp % bh == 0, (Hp, bh)
    n4 = 4 * n_pred
    nh = Hp // bh
    row = lambda rm: pl.BlockSpec(  # noqa: E731
        (1, 1, Wp, C), lambda i, h: (i, rm(h), 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v2, bh=bh, n_pred=n_pred),
        grid=(KB, nh),
        in_specs=[
            pl.BlockSpec((1, bh, Wp, C), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            row(lambda h: jnp.maximum(h * bh - 2, 0)),
            row(lambda h: jnp.maximum(h * bh - 1, 0)),
            row(lambda h: jnp.minimum(h * bh + bh, Hp - 1)),
            row(lambda h: jnp.minimum(h * bh + bh + 1, Hp - 1)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, 2, n_pred), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KB, 2, n_pred), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n4), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, x, x, wa.reshape(9 * C, Ca), ba.reshape(1, Ca),
      wb.reshape(9 * Ca, wb.shape[3]), bb.reshape(1, wb.shape[3]),
      wpred, bpred.reshape(1, n4))


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def pallas_chain(x, wa, ba, wb, bb, wpred, bpred, n_pred, interpret=False,
                 bh=BH, stats=True):
    KB, Hp, Wp, C = x.shape
    Ca = wa.shape[3]
    assert Hp % bh == 0, (Hp, bh)
    n4 = 4 * n_pred
    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, n_pred=n_pred, stats=stats),
        grid=(KB,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, 2, n_pred), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KB, 2, n_pred), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Hp, Wp, Ca), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wa.reshape(9 * C, Ca), ba.reshape(1, Ca),
      wb.reshape(9 * Ca, wb.shape[3]), bb.reshape(1, wb.shape[3]),
      wpred, bpred.reshape(1, n4))


@functools.partial(jax.jit, static_argnums=(7,))
def xla_chain_map(x, wa, ba, wb, bb, wpred, bpred, f32_logits=False):
    conv = lambda v, w: jax.lax.conv_general_dilated(  # noqa: E731
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    a = jax.nn.relu(conv(x, wa) + ba).astype(x.dtype)
    b = jax.nn.relu(conv(a, wb) + bb).astype(x.dtype)
    pm = jnp.dot(b, wpred, preferred_element_type=jnp.float32) + bpred
    # Production keeps the logits map in compute dtype (bf16); the Pallas
    # chain consumes the f32 accumulator directly, so the CORRECTNESS
    # oracle uses f32_logits=True while the TIMING leg matches production.
    return pm if f32_logits else pm.astype(x.dtype)


def xla_chain(x, wa, ba, wb, bb, wpred, bpred, n_pred, f32_logits=False):
    from mst_tpu.ops.softargmax import softargmax2d_packed

    pm = xla_chain_map(x, wa, ba, wb, bb, wpred, bpred, f32_logits)
    return softargmax2d_packed(pm, n_pred)  # (KB, P, 2) x/y


def main():
    interpret = jax.default_backend() != "tpu"
    if not interpret:
        from mst_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    KB, Hp, Wp, C, CA = (2, 32, 24, 8, 16) if interpret else \
        (160, 176, 240, 64, 128)
    P = 3 if interpret else 12
    dtype = jnp.float32 if interpret else jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    mk = lambda k, shape, sc: jax.jit(  # noqa: E731
        lambda kk: (jax.random.normal(kk, shape, jnp.float32) * sc).astype(
            dtype))(k)
    x = mk(ks[0], (KB, Hp, Wp, C), 0.5)
    wa = mk(ks[1], (3, 3, C, CA), 0.08)
    ba = mk(ks[2], (CA,), 0.1).astype(jnp.float32)
    wb = mk(ks[3], (3, 3, CA, CA), 0.08)
    bb = mk(ks[4], (CA,), 0.1).astype(jnp.float32)
    wpred = mk(ks[5], (CA, 4 * P), 0.2)
    bpred = mk(ks[6], (4 * P,), 0.1).astype(jnp.float32)
    jax.block_until_ready(x)
    print(f"[probe] backend={jax.default_backend()} x={x.shape}", flush=True)

    want = xla_chain(x, wa, ba, wb, bb, wpred, bpred, P, f32_logits=True)
    jax.block_until_ready(want)
    print("[probe] xla chain (f32-logits oracle) ran", flush=True)
    want_bf16 = xla_chain(x, wa, ba, wb, bb, wpred, bpred, P)
    err_rounding = float(jnp.max(jnp.abs(want_bf16 - want)))
    print(f"[probe] bf16-logit rounding err (production vs oracle): "
          f"{err_rounding:.5f} px", flush=True)
    for vname, vfn in (
            ("v1", lambda: pallas_chain(
                x, wa, ba, wb, bb, wpred, bpred, P, interpret)),
            ("v2.bh16", lambda: pallas_chain_v2(
                x, wa, ba, wb, bb, wpred, bpred, P, BH, interpret)),
            ("v2.bh44", lambda: pallas_chain_v2(
                x, wa, ba, wb, bb, wpred, bpred, P, 44, interpret))):
        if interpret and vname == "v2.bh44":
            continue  # 32 % 44 != 0 on the tiny CPU shape
        got = vfn()
        jax.block_until_ready(got)
        got = jnp.stack([got[:, 0], got[:, 1]], axis=-1)  # (KB, P, 2)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"[probe] pallas chain {vname} max abs coord err: "
              f"{err:.5f} px", flush=True)
        assert err < (1e-3 if interpret else 0.05), (vname, err)

    if interpret:
        print("(CPU interpret mode: correctness only)")
        return
    flops = 2 * KB * Hp * Wp * (9 * C * CA + 9 * CA * CA + CA * 4 * P)

    # Each timed iteration is ONE jitted dispatch that perturbs x with a
    # carried (numerically zero) scalar derived from the previous output,
    # so the tunneled runtime can't dedupe repeat executions (TPU
    # measurement discipline note); the "perturb only" leg prices the
    # extra elementwise pass so it can be subtracted.
    def make_step(fn):
        @jax.jit
        def step(v, s):
            # vc is returned as carry, so the perturb pass is materialized
            # identically for XLA and Pallas legs (a custom call can't fuse
            # the add into its operand read, XLA convs can — returning vc
            # makes both pay exactly one pass, priced by "perturb only")
            vc = v + (s * 0).astype(v.dtype)
            out = fn(vc)
            return vc, jnp.max(out).astype(jnp.float32)
        return step

    for name, step in (
            ("perturb only", make_step(lambda v: v[:, :1, :1, :1])),
            ("xla chain (convs+pred map only)", make_step(
                lambda v: xla_chain_map(v, wa, ba, wb, bb, wpred, bpred))),
            ("xla chain (+packed softargmax)", make_step(
                lambda v: xla_chain(v, wa, ba, wb, bb, wpred, bpred, P))),
            ("pallas chain v1.bh16", make_step(
                lambda v: pallas_chain(v, wa, ba, wb, bb, wpred, bpred,
                                       P))),
            ("pallas chain v1.bh44", make_step(
                lambda v: pallas_chain(v, wa, ba, wb, bb, wpred, bpred,
                                       P, False, 44))),
            ("pallas chain v1.bh16 convs-only", make_step(
                lambda v: pallas_chain(v, wa, ba, wb, bb, wpred, bpred,
                                       P, False, 16, False))),
            ("pallas chain v2.bh16", make_step(
                lambda v: pallas_chain_v2(v, wa, ba, wb, bb, wpred, bpred,
                                          P, 16))),
            ("pallas chain v2.bh44", make_step(
                lambda v: pallas_chain_v2(v, wa, ba, wb, bb, wpred, bpred,
                                          P, 44)))):
        xc, s = step(x, jnp.float32(0))
        jax.block_until_ready(s)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            xc, s = step(xc, s)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms  ({flops / dt / 1e12:.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
