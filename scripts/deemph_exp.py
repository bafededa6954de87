"""Experiment: compile/run cost of deemphasis variants at synthesis length.

Variants: associative_scan (current), truncated-FIR via conv (0.97^k dies
below 1e-10 by k=768, so the IIR is numerically a finite filter).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


COEF = 0.97
TAPS = 768


def deemph_scan(x):
    a = jnp.full_like(x, COEF)

    def combine(l, r):
        return r[0] * l[0], r[0] * l[1] + r[1]

    return jax.lax.associative_scan(combine, (a, x), axis=-1)[1]


def deemph_fir(x):
    k = (COEF ** np.arange(TAPS)).astype(np.float32)[None, None, ::-1]
    xp = jnp.pad(x[:, None, :], ((0, 0), (0, 0), (TAPS - 1, 0)))
    y = jax.lax.conv_general_dilated(xp, jnp.asarray(k.copy()), (1,), "VALID")
    return y[:, 0, :]


def run(label, fn, x):
    t = time.time()
    c = jax.jit(fn).lower(x).compile()
    mark(f"{label}: compile {time.time() - t:.1f}s")
    for i in (1, 2):
        t = time.time()
        _ = np.asarray(c(x))
        mark(f"{label}: run{i} {time.time() - t:.2f}s")


def main():
    mark(f"devices={jax.devices()}")
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    mark("claimed chip")

    x = jax.random.normal(jax.random.PRNGKey(0), (40, 232824))
    # numeric agreement on CPU-sized slice first
    y1 = np.asarray(deemph_scan(x[:2, :20000]))
    y2 = np.asarray(deemph_fir(x[:2, :20000]))
    mark(f"max abs diff scan vs fir: {np.abs(y1 - y2).max():.3e} "
         f"(scale {np.abs(y1).max():.1f})")

    run("scan", deemph_scan, x)
    run("fir ", deemph_fir, x)
    mark("DONE")


if __name__ == "__main__":
    main()
