"""Probe: can a hand-written Pallas 3x3 conv beat XLA's on the decode's
dominant shape?

The last theoretical eval-perf route (ROADMAP round-4 notes) is a Pallas
kernel owning the WHOLE finest decoder level, which only pays off if
Pallas 3x3 convs can match/beat the XLA conv pipeline (126-190 TF/s in
situ on v5e) — otherwise the saved intermediate HBM traffic (~6 ms) is
lost to slower matmuls. This benchmark measures exactly that gate: the
b1 conv shape ((KB=160, 176, 240, 128) x (3, 3, 128, 128), bf16, SAME)
as 9 shifted MXU dots per row-tile (halo via two neighbor row-blocks of
a BH-padded input; static index maps), vs lax.conv_general_dilated.

Run on TPU: python -m benchmarks.pallas_conv_probe
Correctness-only on CPU: python -m benchmarks.pallas_conv_probe --cpu
(env vars are too late here: the interpreter pre-imports jax on the axon
platform, so --cpu must go through jax.config before first backend use)
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

BH = 8  # rows per tile


def _kernel(x_top, x_mid, x_bot, w_ref, o_ref, *, bh):
    mid = x_mid[0]                       # (BH, Wp, C) rows [r, r+BH)
    wp, c = mid.shape[1], mid.shape[2]
    # halo rows come from the neighbor blocks of the BH-padded input
    xext = jnp.concatenate([x_top[0, -1:], mid, x_bot[0, :1]], axis=0)

    acc = jnp.zeros((bh * wp, w_ref.shape[3]), jnp.float32)
    for dy in (0, 1, 2):
        rows = xext[dy:dy + bh]          # (BH, Wp, C)
        for dx in (0, 1, 2):
            if dx == 0:
                shifted = jnp.concatenate(
                    [jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1)
            elif dx == 2:
                shifted = jnp.concatenate(
                    [rows[:, 1:], jnp.zeros_like(rows[:, :1])], axis=1)
            else:
                shifted = rows
            acc = acc + jnp.dot(
                shifted.reshape(bh * wp, c), w_ref[dy, dx],
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, wp, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_conv3x3(x, w, interpret=False):
    """SAME 3x3 stride-1 conv, NHWC x HWIO. H % BH == 0."""
    B, H, W, C = x.shape
    Co = w.shape[3]
    assert H % BH == 0, (H, BH)
    # pad H by one BH block on each side so every tile has static
    # neighbors (the padded blocks supply zero halo rows at the edges)
    xp = jnp.pad(x, ((0, 0), (BH, BH), (0, 0), (0, 0)))
    nh = H // BH
    mk = lambda off: pl.BlockSpec(  # noqa: E731
        (1, BH, W, C), lambda i, h, off=off: (i, h + off, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, bh=BH),
        grid=(B, nh),
        in_specs=[mk(0), mk(1), mk(2),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BH, W, Co), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w)


def _kernel_v2(x_mid, x_top, x_bot, w_ref, o_ref, *, bh):
    """One deep dot per tile: x9 (BH*Wp, 9C) @ w9 (9C, Co).

    Halo rows arrive as dedicated 1-row streams (clamped index maps,
    zeroed at the image borders), so each input row is read ~(1 + 2/BH)x
    from HBM instead of the v1 kernel's 3x whole-block loads; the nine
    shifted taps concatenate on the channel axis into a single K=9C
    contraction that keeps the MXU pipeline full (the v1 kernel's nine
    K=C dots interleave VPU shifts between short matmuls).
    """
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    mid = x_mid[0]                            # (BH, Wp, C)
    wp, c = mid.shape[1], mid.shape[2]
    dt = mid.dtype
    top = x_top[0] * (h > 0).astype(dt)       # zero top halo at h == 0
    bot = x_bot[0] * (h < nh - 1).astype(dt)  # zero bottom halo at the end
    xext = jnp.concatenate([top, mid, bot], axis=0)   # (BH+2, Wp, C)
    z = jnp.zeros_like(xext[:, :1])
    xw = jnp.concatenate([z, xext, z], axis=1)        # (BH+2, Wp+2, C)
    x9 = jnp.concatenate(
        [xw[dy:dy + bh, dx:dx + wp].reshape(bh * wp, c)
         for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=1)
    acc = jnp.dot(x9, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, wp, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_conv3x3_v2(x, w, bh=BH, interpret=False):
    """SAME 3x3 stride-1 conv, NHWC x HWIO. H % bh == 0."""
    B, H, W, C = x.shape
    Co = w.shape[3]
    assert H % bh == 0, (H, bh)
    nh = H // bh
    # (3, 3, C, Co) -> (9C, Co), (dy, dx, c) major-to-minor: matches the
    # kernel's x9 concat order
    w9 = w.reshape(9 * C, Co)
    row = lambda rm: pl.BlockSpec(  # noqa: E731
        (1, 1, W, C), lambda i, h: (i, rm(h), 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v2, bh=bh),
        grid=(B, nh),
        in_specs=[
            pl.BlockSpec((1, bh, W, C), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            row(lambda h: jnp.maximum(h * bh - 1, 0)),
            row(lambda h: jnp.minimum(h * bh + bh, H - 1)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, W, Co), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        interpret=interpret,
    )(x, x, x, w9)


@jax.jit
def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    interpret = jax.default_backend() != "tpu"
    if not interpret:
        from mst_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    KB, H, W, C, Co = (2, 16, 32, 8, 8) if interpret else \
        (160, 176, 240, 128, 128)
    # interpret mode checks correctness in f32 (CPU bf16 emulation through
    # the interpreter is pathologically slow); the TPU run measures bf16
    dtype = jnp.float32 if interpret else jnp.bfloat16
    # generate ON the device: materializing this on host is 13.5 GB of
    # float64 and a 1.7 GB tunnel transfer (minutes; it stalled the first
    # probe run past its deadline)
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.jit(lambda k: (jax.random.normal(k, (KB, H, W, C), jnp.float32)
                           * 0.5).astype(dtype))(kx)
    w = jax.jit(lambda k: (jax.random.normal(k, (3, 3, C, Co), jnp.float32)
                           * 0.05).astype(dtype))(kw)
    jax.block_until_ready((x, w))

    print(f"[probe] backend={jax.default_backend()} shape={x.shape}",
          flush=True)
    # fused jitted reduction: an eager astype(f32) of these (KB,H,W,C)
    # tensors materializes ~3.5 GB each and OOMs the 16 GB v5e
    maxdiff = jax.jit(lambda a, b: jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
    want = xla_conv3x3(x, w)
    jax.block_until_ready(want)
    print("[probe] xla compiled+ran", flush=True)
    for vname, vfn in (("v1", lambda v: pallas_conv3x3(v, w, interpret)),
                       ("v2.bh8", lambda v: pallas_conv3x3_v2(
                           v, w, 8, interpret)),
                       ("v2.bh16", lambda v: pallas_conv3x3_v2(
                           v, w, 16, interpret))):
        got = vfn(x)
        jax.block_until_ready(got)
        err = float(maxdiff(got, want))
        del got
        print(f"[probe] pallas {vname} max abs err vs XLA conv: {err:.4f}",
              flush=True)
        assert err < 0.15, (vname, err)  # bf16 noise on |acc|~O(3)
    del want

    if interpret:
        print("(CPU interpret mode: correctness only)")
        return
    flops = 2 * KB * H * W * 9 * C * Co
    for name, fn in (("xla", lambda v: xla_conv3x3(v, w)),
                     ("pallas v1", lambda v: pallas_conv3x3(v, w, False)),
                     ("pallas v2.bh8",
                      lambda v: pallas_conv3x3_v2(v, w, 8, False)),
                     ("pallas v2.bh16",
                      lambda v: pallas_conv3x3_v2(v, w, 16, False))):
        # chain out -> in (C == Co): every iteration sees fresh values
        # (defeats the tunnel's repeat-execution dedup) with only two
        # buffers alive — 10 queued 1.7 GB temps OOM the chip otherwise
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms  ({flops / dt / 1e12:.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
