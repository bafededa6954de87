"""Composable conv-block stacks with a dual batch / incremental-step API.

The reference's networks (``/root/reference/networks.py``) are linear stacks
of three block types:

* C  — conv1d -> layer-norm -> optional activation -> dropout
       (reference modules.py:91-141)
* HC — gated highway conv: one conv producing 2C channels, split into
       gate H1 / info H2, EACH layer-normed separately, then
       sigmoid(H1)*H2 + (1-sigmoid(H1))*x, dropout (modules.py:143-197).
       The residual uses the un-padded input.
* D  — stride-2 transposed conv -> layer-norm -> activation -> dropout
       (modules.py:199-247)

Each stack is described by a static tuple of specs; parameters are a list of
pytrees. The SAME spec drives two execution modes:

- ``apply_stack``: full-sequence batch apply (training / SSRN / TextEnc) —
  every block is one MXU matmul over (B*T, K*C) as built in ``layers.py``.
- ``step_stack``: one-frame causal apply for the incremental autoregressive
  decoder, reading past frames from per-layer history buffers. This replaces
  the reference's O(max_T^2) full-graph recompute per output frame
  (synthesize.py:45-54) with O(max_T) work.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Act = Optional[str]  # None | "relu" | "sigmoid"


@dataclass(frozen=True)
class C:
    """Conv block spec. out_ch=None keeps input width (modules.py:127-128)."""
    size: int = 1
    rate: int = 1
    out_ch: Optional[int] = None
    act: Act = None
    causal: bool = False


@dataclass(frozen=True)
class HC:
    """Highway-conv block spec; output width always equals input width."""
    size: int = 3
    rate: int = 1
    causal: bool = False


@dataclass(frozen=True)
class D:
    """Stride-2 transposed-conv block spec (non-causal; SSRN only)."""
    size: int = 3
    out_ch: Optional[int] = None
    act: Act = None


def _act(x, name: Act):
    if name is None:
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# init


def init_stack(key, in_ch: int, specs: Sequence) -> Tuple[List[dict], int]:
    """Initialize params for a stack; returns (params_list, out_ch)."""
    params = []
    ch = in_ch
    for spec in specs:
        key, sub = jax.random.split(key)
        if isinstance(spec, C):
            out = spec.out_ch or ch
            p = {"conv": L.init_conv(sub, ch, out, spec.size),
                 "ln": L.init_layer_norm(out)}
            ch = out
        elif isinstance(spec, HC):
            p = {"conv": L.init_conv(sub, ch, 2 * ch, spec.size),
                 "ln1": L.init_layer_norm(ch),
                 "ln2": L.init_layer_norm(ch)}
        elif isinstance(spec, D):
            out = spec.out_ch or ch
            p = {"conv": L.init_deconv(sub, ch, out, spec.size),
                 "ln": L.init_layer_norm(out)}
            ch = out
        else:
            raise TypeError(spec)
        params.append(p)
    return params, ch


# ---------------------------------------------------------------------------
# batch apply


def apply_block(p: dict, spec, x, *, ln_eps: float, dropout_rate: float,
                rng, train: bool, dtype=None, use_pallas: bool = False,
                act_dtype=None):
    if use_pallas and train and isinstance(spec, HC) and act_dtype is None:
        # EXPERIMENTAL (cfg.use_pallas): fused forward + hand-written
        # Pallas VJP for HC training, gated by a static VMEM-fit check —
        # blocks that bust the budget (SSRN's C=1024 HCs) stay on XLA.
        # NOT taken under "bfloat16_full" (act_dtype set): the kernel
        # expects f32 activations, and measured r5 the bf16-storage XLA
        # path beats the kernel's bf16 mode anyway (BASELINE.md).
        # Measured roughly XLA-parity at f32 (BASELINE.md); kept for its
        # bf16 mode. The eval-mode per-block kernels that used to branch
        # here were measured losers and were retired in round 4.
        from ..ops.pallas_common import default_interpret
        from ..ops.pallas_hc_vjp import hc_block_trainable, hc_train_fits
        if hc_train_fits(x.shape[1], x.shape[-1], spec.size, spec.rate):
            # bf16=True when compute_dtype asks for bf16 conv operands
            y = hc_block_trainable(
                x, p["conv"]["w"], p["conv"]["b"],
                p["ln1"]["gamma"], p["ln1"]["beta"],
                p["ln2"]["gamma"], p["ln2"]["beta"],
                spec.size, spec.rate, spec.causal, ln_eps,
                default_interpret(), dtype is jnp.bfloat16)
            return L.dropout(y, dropout_rate, rng, train)
    # act_dtype (the "bfloat16_full" training mode): the ENTIRE block chain
    # stores at act_dtype — conv outputs (preferred_element_type; the MXU
    # still accumulates f32 internally), LN outputs (stats always compute
    # f32, layers.layer_norm), gates, dropout. The r5 profile showed the
    # bf16 step is VPU/HBM bound on exactly these (B,T,2C) f32 elementwise
    # chains (~38 of ~55 ms/step for SSRN), not on matmuls — narrowing the
    # operands alone (plain "bfloat16") leaves that traffic untouched.
    if isinstance(spec, C):
        y = L.conv1d(p["conv"], x, size=spec.size, rate=spec.rate,
                     causal=spec.causal, dtype=dtype, out_dtype=act_dtype)
        y = L.layer_norm(p["ln"], y, ln_eps)
        y = _act(y, spec.act)
    elif isinstance(spec, HC):
        h = L.conv1d(p["conv"], x, size=spec.size, rate=spec.rate,
                     causal=spec.causal, dtype=dtype, out_dtype=act_dtype)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h1 = jax.nn.sigmoid(L.layer_norm(p["ln1"], h1, ln_eps))
        h2 = L.layer_norm(p["ln2"], h2, ln_eps)
        one = jnp.asarray(1.0, h1.dtype)
        y = h1 * h2 + (one - h1) * x.astype(h1.dtype)
    elif isinstance(spec, D):
        y = L.conv1d_transpose(p["conv"], x, dtype=dtype,
                               out_dtype=act_dtype)
        y = L.layer_norm(p["ln"], y, ln_eps)
        y = _act(y, spec.act)
    else:
        raise TypeError(spec)
    y = L.dropout(y, dropout_rate, rng, train)
    if act_dtype is not None and y.dtype != act_dtype:
        y = y.astype(act_dtype)
    return y


def apply_stack(params: Sequence[dict], specs: Sequence, x, *,
                ln_eps: float = 1e-12, dropout_rate: float = 0.0,
                rng=None, train: bool = False, dtype=None,
                remat: bool = False, use_pallas: bool = False,
                act_dtype=None):
    """Run a stack. remat=True wraps each block in jax.checkpoint so the
    backward pass recomputes block activations instead of storing all
    ~40 layers' intermediates — the HBM-for-FLOPs trade for big batches.
    use_pallas routes eval-mode blocks through the fused kernels.
    act_dtype narrows inter-block activations (see apply_block)."""
    if act_dtype is not None:
        x = x.astype(act_dtype)
    for i, (p, spec) in enumerate(zip(params, specs)):
        layer_rng = jax.random.fold_in(rng, i) if (train and rng is not None) else None

        def block_fn(p_, x_, rng_):
            return apply_block(p_, spec, x_, ln_eps=ln_eps,
                               dropout_rate=dropout_rate, rng=rng_,
                               train=train, dtype=dtype,
                               use_pallas=use_pallas, act_dtype=act_dtype)

        if remat:
            block_fn = jax.checkpoint(block_fn, static_argnums=())
        x = block_fn(p, x, layer_rng)
    return x


# ---------------------------------------------------------------------------
# incremental step apply (causal stacks only)


def history_pad(spec) -> int:
    """Frames of left context a causal block needs: (K-1)*rate."""
    return (spec.size - 1) * spec.rate


def init_stack_state(specs: Sequence, in_chs: Sequence[int], batch: int,
                     max_t: int, dtype=jnp.float32) -> List[Optional[jax.Array]]:
    """Per-layer input-history buffers for incremental decode.

    Layer i with kernel size K>1 gets a (B, pad_i + max_t, C_in_i) buffer,
    where pad_i = (K-1)*rate frames of implicit zero left-context — exactly
    the zeros the batch path's causal padding supplies. Size-1 layers carry
    no state (None).
    """
    state = []
    for spec, cin in zip(specs, in_chs):
        if isinstance(spec, D):
            raise ValueError("deconv blocks cannot run incrementally")
        if spec.size == 1:
            state.append(None)
        else:
            pad = history_pad(spec)
            state.append(jnp.zeros((batch, pad + max_t, cin), dtype))
    return state


def stack_in_channels(specs: Sequence, in_ch: int) -> List[int]:
    """Input channel count of each layer in the stack."""
    chs = []
    ch = in_ch
    for spec in specs:
        chs.append(ch)
        if isinstance(spec, C) and spec.out_ch:
            ch = spec.out_ch
        elif isinstance(spec, D) and spec.out_ch:
            ch = spec.out_ch
    return chs


def step_block(p: dict, spec, x_t, buf, t, *, ln_eps: float):
    """One causal block on one frame. x_t (B, C); buf as in init_stack_state.

    Returns (y_t, new_buf). Matches column t of ``apply_block`` bit-for-bit
    (same matmul contraction order as ``conv1d``).
    """
    assert spec.causal or spec.size == 1, "step apply requires causal blocks"
    if spec.size == 1:
        frames = x_t[:, None, :]
        new_buf = None
    else:
        pad = history_pad(spec)
        buf = jax.lax.dynamic_update_slice(
            buf, x_t[:, None, :], (0, pad + t, 0))
        # lags (K-1)ρ ... ρ, 0  ->  buffer positions t, t+ρ, ..., t+(K-1)ρ
        taps = [jax.lax.dynamic_slice(
                    buf, (0, t + k * spec.rate, 0),
                    (buf.shape[0], 1, buf.shape[2]))
                for k in range(spec.size)]
        frames = jnp.concatenate(taps, axis=1)  # (B, K, C) oldest-first
        new_buf = buf

    if isinstance(spec, C):
        y = L.conv1d_step(p["conv"], frames)
        y = L.layer_norm(p["ln"], y, ln_eps)
        y = _act(y, spec.act)
    elif isinstance(spec, HC):
        h = L.conv1d_step(p["conv"], frames)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h1 = jax.nn.sigmoid(L.layer_norm(p["ln1"], h1, ln_eps))
        h2 = L.layer_norm(p["ln2"], h2, ln_eps)
        y = h1 * h2 + (1.0 - h1) * x_t
    else:
        raise TypeError(spec)
    return y, new_buf


def step_stack(params: Sequence[dict], specs: Sequence, x_t, state, t, *,
               ln_eps: float = 1e-12):
    """One frame through a causal stack. Returns (y_t, new_state)."""
    new_state = []
    for p, spec, buf in zip(params, specs, state):
        x_t, nb = step_block(p, spec, x_t, buf, t, ln_eps=ln_eps)
        new_state.append(nb)
    return x_t, new_state
