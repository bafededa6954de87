"""Fused Pallas kernel: the ENTIRE Text2Mel autoregressive decode loop.

The incremental decoder is dispatch-bound, not FLOP-bound: 210 sequential
steps, each ~24 tiny layer-ops (ring-buffer update, 3-tap gather, a
(B, 3C)x(3C, 2C) matmul, two layer-norms, a gate) plus a single-query
attention row — ~200 XLA ops per step inside a fori_loop, measured 20.9%
MFU / 252 us per step at B=40 (BASELINE.md round 3). This kernel runs the
WHOLE loop — all AudioEnc/AudioDec layers, the monotonic-window attention,
cursor updates, and teacher forcing — in ONE pallas_call:

  * every weight lives in VMEM for the entire decode (~30 MB f32; the
    v5e's 128 MB VMEM is unlocked with CompilerParams.vmem_limit_bytes —
    the 16 MB figure is only the default scoped limit);
  * causal conv history is kept in VMEM scratch SHIFT REGISTERS, one per
    HC layer, of exactly (2*rate+1, B, C) rows — taps land at STATIC rows
    (0, rate, 2*rate), so each layer step is: shift one row, append, one
    lane-concat, one MXU matmul. No HBM traffic per step at all; only
    the per-step y/alignment rows are written out.
  * matmuls run f32 (Mosaic multi-pass), so the kernel is numerically
    parity-testable against the XLA incremental decode path (HIGHEST
    precision) — see tests/test_pallas_decode.py.

Semantics contract: identical to Text2Mel.decode(mode="incremental")
(reference /root/reference/networks.py:73-212 layer stacks;
networks.py:140-151 attention with the [p, p+win) monotonic window of
networks.py:141-147; synthesize.py:45-54 loop structure).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

NEG_INF = -(2.0 ** 32 - 1.0)


class _Layer(NamedTuple):
    kind: str        # "C" | "HC"
    idx: int         # index into the packed weight array of its kind
    cin: int
    cout: int        # C: output width; HC: C (residual width)
    rate: int        # HC dilation
    act: str | None  # C activation


def _programs(cfg) -> Tuple[Tuple[_Layer, ...], Tuple[_Layer, ...]]:
    """Static layer programs for AudioEnc and AudioDec, with packed-array
    indices assigned in traversal order (enc first)."""
    from ..models.blocks import C as Cspec, HC as HCspec
    from ..models.text2mel import audio_dec_specs, audio_enc_specs

    ci = hi = 0
    progs = []
    for specs, cin0 in ((audio_enc_specs(cfg), cfg.n_mels),
                        (audio_dec_specs(cfg), 2 * cfg.d)):
        prog = []
        ch = cin0
        for s in specs:
            if isinstance(s, Cspec):
                out = s.out_ch or ch
                prog.append(_Layer("C", ci, ch, out, 1, s.act))
                ci += 1
                ch = out
            elif isinstance(s, HCspec):
                prog.append(_Layer("HC", hi, ch, ch, s.rate, None))
                hi += 1
            else:
                raise TypeError(s)
        progs.append(tuple(prog))
    return tuple(progs)


def pack_decode_params(cfg, params) -> dict:
    """Pack AudioEnc+AudioDec weights into a few dense arrays (kernel
    inputs). C-layer kernels pad into (max_cin, max_cout) slots; HC
    kernels are uniform (3*C, 2*C). All f32. jnp throughout so the packing
    traces under jit (the Synthesizer jits decode over param tracers);
    XLA folds it into a handful of pad+concat ops."""
    enc_prog, dec_prog = _programs(cfg)
    layers = list(enc_prog) + list(dec_prog)
    n_c = sum(1 for l in layers if l.kind == "C")
    n_hc = sum(1 for l in layers if l.kind == "HC")
    c_max_in = max(l.cin for l in layers if l.kind == "C")
    c_max_out = max(l.cout for l in layers if l.kind == "C")
    C = cfg.d

    cw = jnp.zeros((n_c, c_max_in, c_max_out), jnp.float32)
    cb = jnp.zeros((n_c, c_max_out), jnp.float32)
    cln = jnp.zeros((n_c, 2, c_max_out), jnp.float32)
    hcw = jnp.zeros((n_hc, 3 * C, 2 * C), jnp.float32)
    hcb = jnp.zeros((n_hc, 2 * C), jnp.float32)
    hcln = jnp.zeros((n_hc, 4, C), jnp.float32)

    for stack_params, prog in ((params["audio_enc"], enc_prog),
                               (params["audio_dec"], dec_prog)):
        for p, l in zip(stack_params, prog):
            w = jnp.asarray(p["conv"]["w"], jnp.float32)  # (K, cin, cout)
            if l.kind == "C":
                cw = cw.at[l.idx, : l.cin, : l.cout].set(w[0])
                cb = cb.at[l.idx, : l.cout].set(p["conv"]["b"])
                cln = cln.at[l.idx, 0, : l.cout].set(p["ln"]["gamma"])
                cln = cln.at[l.idx, 1, : l.cout].set(p["ln"]["beta"])
            else:
                # taps ordered oldest-first (lags 2r, r, 0) — matches
                # conv1d_step's frames layout (models/layers.py)
                hcw = hcw.at[l.idx].set(w.reshape(3 * l.cin, 2 * l.cin))
                hcb = hcb.at[l.idx].set(p["conv"]["b"])
                hcln = hcln.at[l.idx, 0].set(p["ln1"]["gamma"])
                hcln = hcln.at[l.idx, 1].set(p["ln1"]["beta"])
                hcln = hcln.at[l.idx, 2].set(p["ln2"]["gamma"])
                hcln = hcln.at[l.idx, 3].set(p["ln2"]["beta"])
    return {"cw": cw, "cb": cb, "cln": cln,
            "hcw": hcw, "hcb": hcb, "hcln": hcln}


def _decode_kernel(*refs,
                   enc_prog, dec_prog, T, win, eps, n_mels, d, prec):
    high3 = prec == "high3"
    hybrid = prec == "hybrid"
    # pallas passes refs as inputs..., outputs..., scratch...
    if hybrid:
        # hi/lo-split copies of the DEC-stack weights only (enc stays on
        # the full-f32 arrays); see fused_decode for the packing
        (kt_ref, v_ref, cw_ref, cb_ref, cln_ref, hcw_ref, hcb_ref,
         hcln_ref, cw2_ref, hcw2_ref, y_ref, a_ref, *bufs) = refs
        c_dec_base = sum(1 for l in enc_prog if l.kind == "C")
        hc_dec_base = sum(1 for l in enc_prog if l.kind == "HC")
    else:
        (kt_ref, v_ref, cw_ref, cb_ref, cln_ref, hcw_ref, hcb_ref,
         hcln_ref, y_ref, a_ref, *bufs) = refs
    B, N, _ = kt_ref.shape
    scale = 1.0 / float(d) ** 0.5
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "hybrid": jax.lax.Precision.HIGHEST,
                 "high3": None,
                 "default": None}[prec]

    def mm(x, w_slice, h3):
        """Layer matmul.

        "highest": f32 6-pass (Mosaic multi-pass; HIGH is not supported
        in-kernel). h3 (the "high3" mode, or a dec-stack layer under
        "hybrid"): the hi/lo bf16 3-pass decomposition (x = xh+xl,
        W = Wh+Wl pre-split; xh@Wh + xh@Wl + xl@Wh — the xl@Wl term is
        below f32 noise) — the same trick as pallas_gl._mm3, at half
        HIGHEST's MXU passes. "default": single-pass f32->bf16 demotion
        (drifts; floor-measurement only).
        """
        if h3:
            wh, wl = w_slice
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.dot(xh, wh, preferred_element_type=jnp.float32)
                    + jnp.dot(xh, wl, preferred_element_type=jnp.float32)
                    + jnp.dot(xl, wh, preferred_element_type=jnp.float32))
        return jnp.dot(x, w_slice, preferred_element_type=jnp.float32,
                       precision=precision)

    def ln(x, gamma, beta):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta

    def run_C(l: _Layer, x, dec):
        # HIGHEST by default: Mosaic's default f32 dot is single-pass —
        # its per-step rounding compounds through the autoregressive
        # feedback until the attention cursor diverges from the XLA path
        # (measured max |dY| 0.55 at default vs 2e-6 at HIGHEST)
        h3 = high3 or (hybrid and dec)
        if high3:
            w = (cw_ref[0, l.idx, : l.cin, : l.cout],
                 cw_ref[1, l.idx, : l.cin, : l.cout])
        elif hybrid and dec:
            w = (cw2_ref[0, l.idx - c_dec_base, : l.cin, : l.cout],
                 cw2_ref[1, l.idx - c_dec_base, : l.cin, : l.cout])
        else:
            w = cw_ref[l.idx, : l.cin, : l.cout]
        h = mm(x, w, h3)
        h = h + cb_ref[l.idx, : l.cout]
        h = ln(h, cln_ref[l.idx, 0, : l.cout], cln_ref[l.idx, 1, : l.cout])
        if l.act == "relu":
            h = jnp.maximum(h, 0.0)
        elif l.act == "sigmoid":
            h = jax.nn.sigmoid(h)
        return h

    def run_HC(l: _Layer, buf, x, t, dec):
        # RING buffer of R = 2*rate+1 rows: x_t overwrites row t mod R;
        # the taps x_{t-2r}, x_{t-r}, x_t sit at rows (t+1) mod R,
        # (t+r+1) mod R, t mod R (their writers ran R-1 and r... steps
        # ago — never yet overwritten). Rows not yet written are the
        # zero-initialized causal left-padding. One row write + three row
        # reads per step, vs shifting all R rows (measured: the shift
        # variant's ~256 row copies/step were the kernel's largest fixed
        # cost).
        R = 2 * l.rate + 1
        wi = jax.lax.rem(t, R)
        buf[pl.ds(wi, 1)] = x[None]
        i0 = jax.lax.rem(t + 1, R)
        i1 = jax.lax.rem(t + l.rate + 1, R)
        taps = jnp.concatenate([buf[pl.ds(i0, 1)][0], buf[pl.ds(i1, 1)][0],
                                x], axis=-1)                # (B, 3C)
        h3 = high3 or (hybrid and dec)
        if high3:
            w = (hcw_ref[0, l.idx], hcw_ref[1, l.idx])
        elif hybrid and dec:
            w = (hcw2_ref[0, l.idx - hc_dec_base],
                 hcw2_ref[1, l.idx - hc_dec_base])
        else:
            w = hcw_ref[l.idx]
        h = mm(taps, w, h3) + hcb_ref[l.idx]
        h1 = h[:, : l.cout]
        h2 = h[:, l.cout:]
        h1 = jax.nn.sigmoid(ln(h1, hcln_ref[l.idx, 0], hcln_ref[l.idx, 1]))
        h2 = ln(h2, hcln_ref[l.idx, 2], hcln_ref[l.idx, 3])
        return h1 * h2 + (1.0 - h1) * x

    n_enc_hc = sum(1 for l in enc_prog if l.kind == "HC")

    def run_stack(prog, x, buf_base, t, dec=False):
        bi = 0
        for l in prog:
            if l.kind == "C":
                x = run_C(l, x, dec)
            else:
                x = run_HC(l, bufs[buf_base + bi], x, t, dec)
                bi += 1
        return x

    def body(t, carry):
        prev, prev_y = carry                   # (B, 1) i32, (B, n_mels)
        q = run_stack(enc_prog, prev_y, 0, t)  # (B, d)

        scores = jnp.sum(kt_ref[:] * q[:, None, :], axis=2) * scale
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        disallowed = (pos < prev) | (pos >= prev + win)
        scores = jnp.where(disallowed, NEG_INF, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        a = e / jnp.sum(e, axis=1, keepdims=True)          # (B, N)
        is_max = a >= jnp.max(a, axis=1, keepdims=True)
        newp = jnp.min(jnp.where(is_max, pos, N), axis=1,
                       keepdims=True).astype(jnp.int32)    # (B, 1)
        ctx = jnp.sum(a[:, :, None] * v_ref[:], axis=1)    # (B, d)

        r = jnp.concatenate([ctx, q], axis=-1)             # (B, 2d)
        logits = run_stack(dec_prog, r, n_enc_hc, t, dec=True)  # (B, n_mels)
        y = jax.nn.sigmoid(logits)

        y_ref[pl.ds(t, 1)] = y[None]
        a_ref[pl.ds(t, 1)] = a[None]
        return newp, y

    # scratch is UNINITIALIZED; the shift registers encode the causal
    # zero left-padding as initial zeros, so clear them first
    for buf in bufs:
        buf[...] = jnp.zeros(buf.shape, jnp.float32)

    prev0 = jnp.zeros((B, 1), jnp.int32)
    y0 = jnp.zeros((B, n_mels), jnp.float32)
    jax.lax.fori_loop(0, T, body, (prev0, y0))


def fused_decode(packed: dict, Kt, V, T: int, cfg, *,
                 interpret: bool = False, prec: str = "highest"):
    """Run the full autoregressive decode in one Pallas kernel.

    Kt/V (B, N, d) f32; returns (Y (B, T, n_mels), A (B, N, T)) matching
    Text2Mel._decode_incremental's outputs. prec:

    - "highest" (default): parity 2e-6 vs the XLA path, identical cursor
      trajectories at every tested geometry. 43.3 ms at bench geometry
      (B=40, r5; XLA incremental 53.7).
    - "high3": hi/lo bf16 3-pass decomposition on every layer matmul
      (half HIGHEST's MXU passes), 29.6 ms at bench geometry.
    - "hybrid": enc stack (the cursor-critical q path) at HIGHEST, dec
      stack at the 3-pass decomposition, 30.7 ms; interpret-mode Y
      error ~3.5x tighter than high3.
    Both reduced modes are OPT-IN only — measured r5
    (scripts/decode_fused_bench.py): at full geometry with random-init
    (diffuse-attention) weights BOTH flip the cursor trajectory at all
    10 tested inits (worst |dY| 0.72). Adjacent in-window attention
    scores tie to within any reduced-precision error at random init, so
    the flip is argmax instability rather than a fixable precision path
    (the score row itself always computes in exact f32 on the VPU).
    With trained (sharp) attention the margins are far larger; the
    default stays the mode whose parity holds unconditionally.
    - "default": single-pass f32->bf16 demotion; drifts. Floor
      measurement only (26.4 ms)."""
    B, N, d = Kt.shape
    enc_prog, dec_prog = _programs(cfg)
    hc_layers = [l for l in enc_prog + dec_prog if l.kind == "HC"]
    scratch = [pltpu.VMEM((2 * l.rate + 1, B, l.cout), jnp.float32)
               for l in hc_layers]

    def hilo(w):
        # stacked bf16 (hi, lo) halves (same bytes as the f32 original);
        # activations split in-kernel
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.stack([hi, lo], axis=0)

    extra_in = []
    if prec == "high3":
        packed = dict(packed, cw=hilo(packed["cw"]),
                      hcw=hilo(packed["hcw"]))
    elif prec == "hybrid":
        # hi/lo copies of the DEC-stack slices only (~40% extra weight
        # VMEM); the enc stack reads the full-f32 arrays at HIGHEST
        n_c_enc = sum(1 for l in enc_prog if l.kind == "C")
        n_hc_enc = sum(1 for l in enc_prog if l.kind == "HC")
        extra_in = [hilo(packed["cw"][n_c_enc:]),
                    hilo(packed["hcw"][n_hc_enc:])]

    kern = functools.partial(
        _decode_kernel, enc_prog=enc_prog, dec_prog=dec_prog, T=T,
        win=cfg.attention_win_size, eps=cfg.ln_eps, n_mels=cfg.n_mels, d=d,
        prec=prec)

    # itemsize-aware: in high3 mode cw/hcw are already the (2, ...) bf16
    # hi/lo stacks (same total bytes as the f32 originals), so a flat *4
    # would double-count them
    vmem_bytes = (sum(int(np.prod(v.shape)) * np.dtype(v.dtype).itemsize
                      for v in
                      (packed["cw"], packed["cb"], packed["cln"],
                       packed["hcw"], packed["hcb"], packed["hcln"]))
                  + sum(int(np.prod(v.shape)) * 2 for v in extra_in)
                  + 2 * B * N * d * 4                    # Kt, V
                  + T * B * (cfg.n_mels + N) * 4          # outs
                  + sum((2 * l.rate + 1) * B * l.cout * 4
                        for l in hc_layers))
    Y, A = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                 * (8 + len(extra_in)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T, B, cfg.n_mels), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, N), jnp.float32)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 1.5) + (8 << 20),
                                 120 << 20)),
        interpret=interpret,
    )(Kt.astype(jnp.float32), V.astype(jnp.float32),
      packed["cw"], packed["cb"], packed["cln"],
      packed["hcw"], packed["hcb"], packed["hcln"], *extra_in)
    return jnp.transpose(Y, (1, 0, 2)), jnp.transpose(A, (1, 2, 0))


def fused_decode_supported() -> bool:
    return _PALLAS
