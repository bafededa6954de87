"""Functional NN primitives for DC-TTS, designed for the TPU MXU.

Re-implements the behavioral contract of the reference's primitive modules
(``/root/reference/modules.py``) — zero-pad embedding, last-axis layer norm,
dilated/causal conv1d + LN + activation + dropout, the gated highway-conv
(HC) block, and the stride-2 transposed conv — but with a TPU-first design:

* Every conv is expressed as **shift + matmul**: for kernel size K and
  dilation rate ρ, the K time-shifted copies of the input are concatenated on
  the channel axis and hit the MXU as ONE (B·T, K·C_in) x (K·C_in, C_out)
  matmul, instead of a small-channel conv op. XLA fuses the pad/slice/concat
  into the matmul operand. This layout is also exactly what the incremental
  decoder needs: frame t of a causal conv reads lags {0, ρ, 2ρ}, so the
  step function is the same matmul on 3 gathered frames.
* Params are plain pytrees (dicts of jnp arrays); modules are pure
  functions of (params, inputs). No framework classes on the hot path.

Weight layouts (conversion targets for TF checkpoints):
  conv:    w (K, C_in, C_out)  — same layout as tf.layers.conv1d kernels.
  deconv:  w (K, C_in, C_out)  — see ``conv1d_transpose`` for the exact
           index mapping to tf.layers.conv2d_transpose's (1, K, C_out, C_in).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# initializers


def _variance_scaling(key, shape, fan_in, dtype=jnp.float32):
    """He-style truncated-normal init, matching the intent of
    tf.contrib.layers.variance_scaling_initializer() (modules.py:133,186,235).
    """
    init = jax.nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    # jax computes fan_in from shape; for (K, Cin, Cout) convs fan_in = K*Cin
    return init(key, shape, dtype)


# ---------------------------------------------------------------------------
# embedding (reference modules.py:13-42)


def init_embedding(key, vocab_size: int, num_units: int):
    table = 0.1 * jax.random.truncated_normal(
        key, -2.0, 2.0, (vocab_size, num_units), jnp.float32)
    return {"table": table}


def embedding_lookup(params, ids, zero_pad: bool = True):
    """ids (B, N) int -> (B, N, E). Row 0 (PAD) is forced to zeros, matching
    the reference's concat-with-zeros trick (modules.py:36-38) — gradients to
    row 0 are discarded identically."""
    table = params["table"]
    if zero_pad:
        table = jnp.concatenate(
            [jnp.zeros((1, table.shape[1]), table.dtype), table[1:]], axis=0)
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# layer norm (reference modules.py:45-64; tf.contrib.layers.layer_norm)


def init_layer_norm(num_units: int):
    return {"gamma": jnp.ones((num_units,), jnp.float32),
            "beta": jnp.zeros((num_units,), jnp.float32)}


def layer_norm(params, x, eps: float = 1e-12):
    """Normalize over the last axis. eps=1e-12 matches
    tf.contrib.layers.layer_norm's variance_epsilon.

    Stats and the normalization always compute in f32; the output is cast
    back to x.dtype. For f32 inputs this is bit-identical to the plain
    form; for bf16 inputs (the "bfloat16_full" training mode) the
    HBM traffic is bf16 while XLA fuses the widening converts into the
    reduction/elementwise chain.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * inv * params["gamma"] + params["beta"]
            ).astype(x.dtype)


# ---------------------------------------------------------------------------
# dilated conv1d as shift+matmul


def init_conv(key, in_ch: int, out_ch: int, size: int, use_bias: bool = True):
    w = _variance_scaling(key, (size, in_ch, out_ch), size * in_ch)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def _gather_taps(x, size: int, rate: int, causal: bool):
    """x (B, T, C) -> (B, T, size*C): concat of the `size` dilated time-shifts.

    Tap k of the output at time t is x[t - (size-1-k)*rate] for causal, or
    x[t + (k - (size-1)//2)*rate]-style SAME alignment for non-causal —
    identical to the reference's left-pad-then-VALID causal scheme
    (modules.py:121-125) and TF SAME padding for odd kernels.
    """
    if size == 1:
        return x
    total = (size - 1) * rate
    if causal:
        left, right = total, 0
    else:
        left = total // 2
        right = total - left
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    T = x.shape[1]
    taps = [jax.lax.slice_in_dim(xp, k * rate, k * rate + T, axis=1)
            for k in range(size)]
    return jnp.concatenate(taps, axis=-1)


def conv1d(params, x, *, size: int = 1, rate: int = 1, causal: bool = False,
           dtype=None, out_dtype=None):
    """Dilated 1-D convolution via one MXU matmul. x (B,T,Cin) -> (B,T,Cout).

    dtype=jnp.bfloat16 casts the matmul operands (accumulation stays f32 via
    preferred_element_type) — the MXU-native mode for synthesis; None keeps
    full f32 for strict parity. out_dtype narrows the STORED result (the
    MXU still accumulates f32 internally) — the "bfloat16_full" training
    mode, where the (B,T,2C) conv outputs dominate HBM traffic.
    """
    w = params["w"]  # (K, Cin, Cout)
    K, cin, cout = w.shape
    assert K == size
    taps = _gather_taps(x, size, rate, causal)
    if dtype == "high":
        # f32 operands at Precision.HIGH: 3-pass bf16 MXU accumulation,
        # ~1e-7 relative error (dsp/stft._mm3x's mode) at half HIGHEST's
        # passes — the eval-time middle rung (no training-feedback loop
        # amplifies it)
        precision = jax.lax.Precision.HIGH
    elif dtype is not None:
        taps = taps.astype(dtype)
        w = w.astype(dtype)
        precision = None
    else:
        # On TPU, DEFAULT precision silently demotes f32 matmul operands to
        # single-pass bf16 — dtype=None must mean TRUE f32 (multi-pass MXU)
        # or the parity contract only holds on CPU. Same rationale as
        # dsp/stft._mm. bf16 mode is the explicit dtype=bfloat16 knob.
        precision = jax.lax.Precision.HIGHEST
    y = jnp.dot(taps, w.reshape(K * cin, cout),
                preferred_element_type=out_dtype or jnp.float32,
                precision=precision)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def conv1d_step(params, frames):
    """Single-frame causal conv step for incremental decode.

    frames: (B, K, Cin) — the input at lags [(K-1)ρ, ..., ρ, 0] (oldest
    first), already gathered by the decoder's state buffers. Returns (B, Cout).
    Numerically identical to column t of ``conv1d(..., causal=True)``.
    """
    w = params["w"]  # (K, Cin, Cout)
    K, cin, cout = w.shape
    y = jnp.dot(frames.reshape(frames.shape[0], K * cin),
                w.reshape(K * cin, cout), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# classic highway net (reference modules.py:67-89 — present but never called
# by the reference's networks; kept for API completeness)


def init_highway(key, num_units: int):
    k1, k2 = jax.random.split(key)
    lim = float(np.sqrt(6.0 / (2 * num_units)))  # glorot-uniform, tf dense default
    return {
        "h": {"w": jax.random.uniform(k1, (num_units, num_units),
                                      jnp.float32, -lim, lim),
              "b": jnp.zeros((num_units,), jnp.float32)},
        "t": {"w": jax.random.uniform(k2, (num_units, num_units),
                                      jnp.float32, -lim, lim),
              # bias -1 so gates start mostly closed (modules.py:85)
              "b": jnp.full((num_units,), -1.0, jnp.float32)},
    }


def highway(params, x):
    """out = relu(xW_h+b_h) * sigmoid(xW_t+b_t) + x * (1 - sigmoid(...))."""
    H = jax.nn.relu(jnp.dot(x, params["h"]["w"]) + params["h"]["b"])
    T = jax.nn.sigmoid(jnp.dot(x, params["t"]["w"]) + params["t"]["b"])
    return H * T + x * (1.0 - T)


# ---------------------------------------------------------------------------
# dropout (inverted, reference tf.layers.dropout semantics)


def dropout(x, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# transposed conv1d, stride 2, SAME (reference modules.py:199-247)


def init_deconv(key, in_ch: int, out_ch: int, size: int = 3,
                use_bias: bool = True):
    w = _variance_scaling(key, (size, in_ch, out_ch), size * in_ch)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv1d_transpose(params, x, dtype=None, out_dtype=None):
    """x (B, T, Cin) -> (B, 2T, Cout): stride-2, kernel-3, SAME deconv.

    TF's conv2d_transpose with kernel (1,3), stride (1,2), SAME (the only
    configuration the reference uses, modules.py:228-239) reduces exactly to:
        y[2t]   = x[t] @ w[0] + x[t-1] @ w[2]
        y[2t+1] = x[t] @ w[1]
    (derived from the gradient-of-strided-conv definition with TF SAME
    padding putting the single crop on the right). Two matmuls + interleave —
    no scatter, MXU-friendly. Our w[k] is (Cin, Cout); TF stores
    (1, K, Cout, Cin), so the converter maps  w[k] = tf_kernel[0, k].T.
    """
    w = params["w"]  # (3, Cin, Cout)
    B, T, cin = x.shape
    cout = w.shape[-1]
    x_prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :T, :]
    if dtype == "high":
        prec = jax.lax.Precision.HIGH     # 3-pass, ~f32 (see conv1d)
    elif dtype is not None:
        x, x_prev, w = x.astype(dtype), x_prev.astype(dtype), w.astype(dtype)
        prec = None
    else:
        prec = jax.lax.Precision.HIGHEST  # true f32 on TPU (see conv1d)
    # the two even-phase dots accumulate and SUM in f32 — narrowing each
    # dot before the add would double the rounding for zero traffic gain
    # (XLA fuses the final cast either way); only the stored result is
    # narrowed, as in conv1d
    even = (jnp.dot(x, w[0], preferred_element_type=jnp.float32,
                    precision=prec)
            + jnp.dot(x_prev, w[2], preferred_element_type=jnp.float32,
                      precision=prec))
    odd = jnp.dot(x, w[1], preferred_element_type=jnp.float32,
                  precision=prec)
    if "b" in params:
        even = even + params["b"]
        odd = odd + params["b"]
    if out_dtype is not None:
        even = even.astype(out_dtype)
        odd = odd.astype(out_dtype)
    return jnp.stack([even, odd], axis=2).reshape(B, 2 * T, cout)
