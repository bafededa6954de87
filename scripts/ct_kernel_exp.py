"""Factored-DFT (4-step Cooley-Tukey) Pallas forward-rDFT prototype.

Question (VERDICT r3 #2): the repo's `ct` XLA backend proves an ~8x
matmul-FLOP cut over the full (2048,1025) DFT matmuls the fused GL
kernels use — does that survive inside a Pallas kernel, where the twiddle
stage stays in VMEM (it lost on XLA only through HBM materialization)?

Factorization here (N = 2048 = 16 x 128, n = 128*n1 + n2,
k = k1 + 16*k2):
    X[k1 + 16 k2] = sum_n1 W16^{n1 k1} W_N^{? } ...
 derived:  X[k] = sum_{n1,n2} x[n1,n2] W^{(128 n1 + n2)(k1 + 16 k2)}
   W^{128 n1 k1} = W16^{n1 k1};  W^{128 n1 16 k2} = 1
   W^{n2 k1} = twiddle;  W^{16 n2 k2} = W128^{n2 k2}
 so:  G[k1, f, n2] = sum_n1 W16[k1,n1] x[f,n1,n2]        (MXU, contract 16)
      Z[k1, f, n2] = G * W_N^{n2 k1}                      (VPU twiddle)
      X[k1, f, k2] = sum_n2 Z[k1,f,n2] W128[n2,k2]        (MXU, contract 128)
Output spectrum lives in layout (k1, f, k2) with k = k1 + 16*k2 — the
inverse transform can consume that layout directly (mirror-image stages),
so a GL round needs exactly two frame-layout transposes.

Run on CPU (numerics, interpret mode) or TPU (timing).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_FFT, N1, N2 = 2048, 16, 128
import os
F = int(os.environ.get("CT_F", "840"))
NF = N_FFT // 2 + 1


def consts(bf16: bool):
    dt = np.dtype(np.float32)
    n1 = np.arange(N1)
    ang16 = 2 * np.pi * np.outer(n1, n1) / N1
    C16, S16 = np.cos(ang16), -np.sin(ang16)
    n2 = np.arange(N2)
    angT = 2 * np.pi * np.outer(n1, n2) / N_FFT     # (k1, n2)
    Tc, Ts = np.cos(angT), -np.sin(angT)
    ang128 = 2 * np.pi * np.outer(n2, n2) / N2
    C128, S128 = np.cos(ang128), -np.sin(ang128)
    # full-mat reference
    n = np.arange(N_FFT)
    f = np.arange(NF)
    angF = 2 * np.pi * np.outer(n, f) / N_FFT
    CF, SF = np.cos(angF), -np.sin(angF)
    out = dict(C16=C16, S16=S16, Tc=Tc[:, None, :], Ts=Ts[:, None, :],
               C128=C128, S128=S128, CF=CF, SF=SF)
    if bf16:
        import ml_dtypes
        for k in ("C16", "S16", "C128", "S128", "CF", "SF"):
            out[k] = out[k].astype(ml_dtypes.bfloat16)
    return {k: jnp.asarray(v.astype(dt) if not hasattr(v, "dtype") or
                           v.dtype == np.float64 else v)
            for k, v in out.items()}


def _dot(a, b, bf16):
    if bf16:
        a = a.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- kernels

def _full_kernel(x_ref, c_ref, s_ref, xr_ref, xi_ref, *, bf16):
    x = x_ref[:]
    xr_ref[:] = _dot(x, c_ref[:], bf16)
    xi_ref[:] = _dot(x, s_ref[:], bf16)


def full_fwd(x, m, bf16, interpret):
    return pl.pallas_call(
        functools.partial(_full_kernel, bf16=bf16),
        out_shape=(jax.ShapeDtypeStruct((F, NF), jnp.float32),
                   jax.ShapeDtypeStruct((F, NF), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(x, m["CF"], m["SF"])


def _fact_kernel(x_ref, c16_ref, s16_ref, tc_ref, ts_ref, c128_ref,
                 s128_ref, xr_ref, xi_ref, *, bf16, transpose_mode):
    x3 = x_ref[:].reshape(F, N1, N2)
    if transpose_mode == "swap":
        xT = jnp.swapaxes(x3, 0, 1)                      # (16, F, 128)
    else:  # static-slice loop
        xT = jnp.stack([x3[:, i, :] for i in range(N1)], axis=0)
    x2 = xT.reshape(N1, F * N2)
    gr = _dot(c16_ref[:], x2, bf16).reshape(N1, F, N2)
    gi = _dot(s16_ref[:], x2, bf16).reshape(N1, F, N2)
    tc, ts = tc_ref[:], ts_ref[:]
    zr = gr * tc - gi * ts
    zi = gr * ts + gi * tc
    zr2 = zr.reshape(N1 * F, N2)
    zi2 = zi.reshape(N1 * F, N2)
    c128, s128 = c128_ref[:], s128_ref[:]
    xr_ref[:] = (_dot(zr2, c128, bf16)
                 - _dot(zi2, s128, bf16)).reshape(N1, F, N2)
    xi_ref[:] = (_dot(zr2, s128, bf16)
                 + _dot(zi2, c128, bf16)).reshape(N1, F, N2)


def _fact_tiled_kernel(x_ref, c16_ref, s16_ref, tc_ref, ts_ref, c128_ref,
                       s128_ref, xr_ref, xi_ref, *, bf16, tf):
    x3 = x_ref[:].reshape(tf, N1, N2)
    xT = jnp.swapaxes(x3, 0, 1)                          # (16, tf, 128)
    x2 = xT.reshape(N1, tf * N2)
    gr = _dot(c16_ref[:], x2, bf16).reshape(N1, tf, N2)
    gi = _dot(s16_ref[:], x2, bf16).reshape(N1, tf, N2)
    tc, ts = tc_ref[:], ts_ref[:]
    zr = (gr * tc - gi * ts).reshape(N1 * tf, N2)
    zi = (gr * ts + gi * tc).reshape(N1 * tf, N2)
    c128, s128 = c128_ref[:], s128_ref[:]
    xr_ref[:] = (_dot(zr, c128, bf16)
                 - _dot(zi, s128, bf16)).reshape(N1, tf, N2)
    xi_ref[:] = (_dot(zr, s128, bf16)
                 + _dot(zi, c128, bf16)).reshape(N1, tf, N2)


def fact_fwd_tiled(x, m, bf16, interpret, tf=512):
    nT = F // tf
    assert F % tf == 0
    mat = lambda shape: pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape))
    out = pl.BlockSpec((N1, tf, N2), lambda t: (0, t, 0))
    return pl.pallas_call(
        functools.partial(_fact_tiled_kernel, bf16=bf16, tf=tf),
        grid=(nT,),
        in_specs=[pl.BlockSpec((tf, N_FFT), lambda t: (t, 0)),
                  mat((N1, N1)), mat((N1, N1)),
                  mat((N1, 1, N2)), mat((N1, 1, N2)),
                  mat((N2, N2)), mat((N2, N2))],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((N1, F, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N1, F, N2), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(x, m["C16"], m["S16"], m["Tc"], m["Ts"], m["C128"], m["S128"])


def fact_fwd(x, m, bf16, interpret, transpose_mode="swap"):
    return pl.pallas_call(
        functools.partial(_fact_kernel, bf16=bf16,
                          transpose_mode=transpose_mode),
        out_shape=(jax.ShapeDtypeStruct((N1, F, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N1, F, N2), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(x, m["C16"], m["S16"], m["Tc"], m["Ts"], m["C128"], m["S128"])


def unscramble(Xk1fk2):
    """(k1, f, k2) -> (f, k) with k = k1 + 16*k2, full 2048 bins."""
    a = np.transpose(np.asarray(Xk1fk2), (1, 2, 0))     # (f, k2, k1)
    return a.reshape(F, N_FFT)


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:8])


def timeit(fn, iters=50):
    fn()  # compile+warm
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def timeit_looped(kernel_fn, x, m, rounds=50, reps=5):
    """Amortize dispatch: `rounds` kernel invocations chained inside ONE
    jit dispatch (tiny scalar feedback forces sequencing)."""
    @jax.jit
    def many(x, m):
        def body(i, c):
            xr, xi = kernel_fn(c, m)
            return x * (1.0 + 0.0 * xr.ravel()[0])
        return jax.lax.fori_loop(0, rounds, body, x)

    fence(many(x, m))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(x, m)
    fence(out)
    return (time.perf_counter() - t0) / (reps * rounds)


def main():
    # argv: variant in {full, fact-swap, fact-stack} and {f32, bf16}
    variant = sys.argv[1] if len(sys.argv) > 1 else "fact-swap"
    prec = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    bf16 = prec == "bf16"
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((F, N_FFT)).astype(np.float32))
    ref = np.fft.fft(np.asarray(x), axis=-1)
    m = consts(bf16)

    import datetime
    print(f"{datetime.datetime.now():%H:%M:%S} compiling {variant}/{prec}",
          flush=True)
    if variant == "full":
        kfn = lambda x_, m_: full_fwd(x_, m_, bf16, interpret)
        jfn = jax.jit(kfn)
        run = lambda: jfn(x, m)
        Xr, Xi = run()
        got = np.asarray(Xr) + 1j * np.asarray(Xi)
        err = np.abs(got - ref[:, :NF]).max() / np.abs(ref).max()
        fact = False
    else:
        if variant == "fact-tiled":
            kfn = lambda x_, m_: fact_fwd_tiled(x_, m_, bf16, interpret)
        else:
            mode = variant.split("-")[1]
            kfn = lambda x_, m_: fact_fwd(x_, m_, bf16, interpret, mode)
        jfn = jax.jit(kfn)
        run = lambda: jfn(x, m)
        Yr, Yi = run()
        gf = unscramble(Yr) + 1j * unscramble(Yi)
        err = np.abs(gf - ref).max() / np.abs(ref).max()
        fact = True
    print(f"[{variant}/{prec}] rel err {err:.2e}", flush=True)
    if on_tpu:
        t = timeit(run, iters)
        tl = timeit_looped(kfn, x, m)
        print(f"[{variant}/{prec}] {t*1e3:.3f} ms/call  "
              f"{tl*1e3:.3f} ms/call in-loop", flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ablate":
        pass  # handled at module end
    else:
        sys.exit(main())


# ------------------------------------------------ stage ablation kernels

def _ablate_kernel(x_ref, c16_ref, s16_ref, tc_ref, ts_ref, c128_ref,
                   s128_ref, xr_ref, xi_ref, *, bf16, tf, stages):
    x3 = x_ref[:].reshape(tf, N1, N2)
    if "T" in stages:
        xT = jnp.swapaxes(x3, 0, 1)
    else:
        xT = x3.reshape(N1, tf, N2)  # wrong math, same shapes
    x2 = xT.reshape(N1, tf * N2)
    if "A" in stages:
        gr = _dot(c16_ref[:], x2, bf16).reshape(N1, tf, N2)
        gi = _dot(s16_ref[:], x2, bf16).reshape(N1, tf, N2)
    else:
        gr = gi = x2.reshape(N1, tf, N2)
    if "W" in stages:
        tc, ts = tc_ref[:], ts_ref[:]
        zr = (gr * tc - gi * ts).reshape(N1 * tf, N2)
        zi = (gr * ts + gi * tc).reshape(N1 * tf, N2)
    else:
        zr, zi = gr.reshape(N1 * tf, N2), gi.reshape(N1 * tf, N2)
    if "C" in stages:
        c128, s128 = c128_ref[:], s128_ref[:]
        xr_ref[:] = (_dot(zr, c128, bf16)
                     - _dot(zi, s128, bf16)).reshape(N1, tf, N2)
        xi_ref[:] = (_dot(zr, s128, bf16)
                     + _dot(zi, c128, bf16)).reshape(N1, tf, N2)
    else:
        xr_ref[:] = zr.reshape(N1, tf, N2)
        xi_ref[:] = zi.reshape(N1, tf, N2)


def ablate_fwd(x, m, bf16, stages, tf=512):
    nT = F // tf
    mat = lambda shape: pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape))
    out = pl.BlockSpec((N1, tf, N2), lambda t: (0, t, 0))
    return pl.pallas_call(
        functools.partial(_ablate_kernel, bf16=bf16, tf=tf, stages=stages),
        grid=(nT,),
        in_specs=[pl.BlockSpec((tf, N_FFT), lambda t: (t, 0)),
                  mat((N1, N1)), mat((N1, N1)),
                  mat((N1, 1, N2)), mat((N1, 1, N2)),
                  mat((N2, N2)), mat((N2, N2))],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((N1, F, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N1, F, N2), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(x, m["C16"], m["S16"], m["Tc"], m["Ts"], m["C128"], m["S128"])


def ablation_main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((F, N_FFT)).astype(np.float32))
    m = consts(True)
    for stages in ("", "T", "TA", "TAW", "TAWC", "C", "AC", "A"):
        kfn = lambda x_, m_: ablate_fwd(x_, m_, True, stages)
        t = timeit_looped(kfn, x, m)
        print(f"stages={stages or '-':5s} {t*1e3:.3f} ms/call", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "ablate":
    ablation_main()
    sys.exit(0)
