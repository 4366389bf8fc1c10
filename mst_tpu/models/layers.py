"""Functional NN layers (NHWC) with explicit pytree parameters.

Parameters are plain nested dicts. Leaf names deliberately mirror the
reference's torch parameter-name vocabulary ('weight', 'bias', 'lora_A',
'lora_B', 'serial_layer', 'parallel_layer') because the adaptation-strategy
freeze matrix (reference: models/trainer.py:112-195) and the delta-checkpoint
format (trainer.py:599-604) are keyed on those substrings.

Convolutions run in NHWC/HWIO — the TPU-native layout — via
lax.conv_general_dilated; torch OIHW weights convert with
w.transpose(2, 3, 1, 0).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers (torch-default parity)
# ---------------------------------------------------------------------------

def _fan_in(shape_hwio):
    kh, kw, cin, _ = shape_hwio
    return kh * kw * cin


def kaiming_uniform_conv(key, shape_hwio, dtype=jnp.float32):
    """torch nn.Conv2d default weight init: kaiming_uniform(a=sqrt(5))."""
    fan_in = _fan_in(shape_hwio)
    gain = math.sqrt(2.0 / (1 + 5.0))  # a = sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape_hwio, dtype, -bound, bound)


def conv_bias_uniform(key, shape_hwio, dtype=jnp.float32):
    """torch nn.Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(_fan_in(shape_hwio))
    return jax.random.uniform(key, (shape_hwio[-1],), dtype, -bound, bound)


# ---------------------------------------------------------------------------
# conv2d
# ---------------------------------------------------------------------------

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d_init(key, in_ch, out_ch, kernel_size, bias=True, zero_init=False,
                dtype=jnp.float32):
    shape = (kernel_size, kernel_size, in_ch, out_ch)
    wkey, bkey = jax.random.split(key)
    if zero_init:
        w = jnp.zeros(shape, dtype)
    else:
        w = kaiming_uniform_conv(wkey, shape, dtype)
    params = {"weight": w}
    if bias:
        params["bias"] = (jnp.zeros((out_ch,), dtype) if zero_init
                          else conv_bias_uniform(bkey, shape, dtype))
    return params


def conv2d_apply(params, x, stride=1, padding="SAME"):
    w = params["weight"]
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DIMNUMS)
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# LoRA conv (MoSA) — loralib.Conv2d-compatible factors
# ---------------------------------------------------------------------------
# loralib stores lora_A (r*k, in*k) and lora_B (out*k, r*k) and computes
# W_eff = W + (lora_B @ lora_A).view(out, in, k, k) * (alpha / r)
# (reference dispatch: models/ynet.py:141-144 passes r=rank, alpha=1).
# We keep identical factor shapes so reference delta checkpoints convert 1:1,
# and evaluate the merged conv in a single MXU pass (weights are tiny relative
# to activations, so re-merging per step is free).


def lora_conv2d_init(key, in_ch, out_ch, kernel_size, rank, bias=True,
                     dtype=jnp.float32):
    base = conv2d_init(key, in_ch, out_ch, kernel_size, bias=bias, dtype=dtype)
    k = kernel_size
    akey = jax.random.fold_in(key, 17)
    # loralib: kaiming_uniform(a=sqrt(5)) on lora_A, zeros on lora_B
    fan_in = in_ch * k
    bound = math.sqrt(2.0 / 6.0) * math.sqrt(3.0 / fan_in)
    base["lora_A"] = jax.random.uniform(
        akey, (rank * k, in_ch * k), dtype, -bound, bound)
    base["lora_B"] = jnp.zeros((out_ch * k, rank * k), dtype)
    return base


def lora_merged_weight(params, rank):
    """HWIO effective weight W + scale * reshape(B @ A)."""
    w = params["weight"]
    kh, kw, cin, cout = w.shape
    delta = params["lora_B"] @ params["lora_A"]  # (out*k, in*k)
    # torch does (B @ A).view(out, in, k, k): a plain row-major reshape
    delta = delta.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)  # -> HWIO
    return w + delta * (1.0 / rank)


def lora_separable_kernels(params):
    """The loralib conv delta factored into two thin convs, exactly.

    loralib builds delta = (B @ A).view(out, in, k, k): the row-major view
    maps flat index f = i*k^2 + a*k + b to factor coordinates
    (s, c) = divmod(f, in*k), so delta[o,i,a,b] = sum_r B[o*k+s, r] *
    A[r, c]. Grouping by s gives the exact two-conv form
      u = conv_{kxk}(x, K_A),   y_delta = conv_{1x1}(u, K_B)
    with K_A[a, b, i, s*rk+r] = A[r, c(i,a,b)] * [s(i,a,b) == s]   and
         K_B[0, 0, s*rk+r, o] = B[o*k+s, r]
    (rk = r*k factor rows; intermediate width k*rk).

    Training through this form never materializes the full (k,k,in,out)
    weight gradient — the frozen base conv contributes no weight grad, and
    the factor grads are weight-grads of these two THIN convs (the merged
    form costs a full dense weight-grad conv per LoRA'd layer, ~0.8 ms for
    the packed stem alone in the r3 train xprof).
    """
    import numpy as np

    w = params["weight"]
    kh, kw, cin, cout = w.shape
    k = kh
    A = params["lora_A"]  # (rk, in*k)
    B = params["lora_B"]  # (out*k, rk)
    rk = A.shape[0]
    # static index maps of the row-major view
    i_ix, a_ix, b_ix = np.meshgrid(np.arange(cin), np.arange(k),
                                   np.arange(k), indexing="ij")
    f = i_ix * k * k + a_ix * k + b_ix
    s_map, c_map = np.divmod(f, cin * k)  # each (in, k, k)
    gathered = A[:, c_map]  # (rk, in, k, k) = A[r, c(i,a,b)]
    s_onehot = jnp.asarray(
        (s_map[..., None] == np.arange(k)).astype(np.float32), A.dtype)
    # K_A[a, b, i, s, r] then fold (s, r) -> s*rk + r
    KA = jnp.einsum("riab,iabs->abisr", gathered, s_onehot)
    KA = KA.reshape(k, k, cin, k * rk)
    KB = B.reshape(cout, k, rk).transpose(1, 2, 0).reshape(
        k * rk, cout)[None, None]  # (1, 1, k*rk, out)
    return KA, KB


def lora_conv2d_apply(params, x, rank, stride=1, padding="SAME",
                      separable=False):
    """LoRA conv forward.

    separable=False uses the merged weight (one conv — cheapest pure
    forward, used in eval). separable=True runs base conv + the separable
    delta path (same function up to fp order; see lora_separable_kernels
    for why training wants it).
    """
    if separable and stride == 1 and padding == "SAME":
        y = jax.lax.conv_general_dilated(
            x, params["weight"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=_DIMNUMS)
        KA, KB = lora_separable_kernels(params)
        u = jax.lax.conv_general_dilated(
            x, KA.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=_DIMNUMS)
        d = jax.lax.conv_general_dilated(
            u, KB.astype(u.dtype), (1, 1), "SAME",
            dimension_numbers=_DIMNUMS)
        y = y + d * (1.0 / rank)
    else:
        w = lora_merged_weight(params, rank)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding=padding,
            dimension_numbers=_DIMNUMS)
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# BatchNorm (for serial adapters; reference Adapter: models/ynet.py:24-26)
# ---------------------------------------------------------------------------

def batchnorm_init(ch, dtype=jnp.float32):
    params = {"weight": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"running_mean": jnp.zeros((ch,), dtype),
             "running_var": jnp.ones((ch,), dtype),
             "num_batches": jnp.zeros((), jnp.int32)}
    return params, state


def batchnorm_apply(params, state, x, train: bool, momentum=0.1, eps=1e-5):
    """NHWC batch norm with torch-default running-stat semantics."""
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"]
                            + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"]
                           + momentum * unbiased,
            "num_batches": state["num_batches"] + 1,
        }
    else:
        mean = state["running_mean"]
        var = state["running_var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["weight"] + params["bias"]
    return y, new_state


# ---------------------------------------------------------------------------
# torch <-> jax weight layout helpers
# ---------------------------------------------------------------------------

def torch_conv_to_hwio(w_oihw):
    return np.transpose(np.asarray(w_oihw), (2, 3, 1, 0))


def hwio_to_torch_conv(w_hwio):
    return np.transpose(np.asarray(w_hwio), (3, 2, 0, 1))
