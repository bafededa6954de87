"""Full-geometry Pallas-vs-XLA parity check on the current backend.

Run on the real TPU to prove the compiled (Mosaic) kernels — not just the
interpreted CPU variants exercised by tests/test_pallas.py — match the lax
path at production shapes:

  1. Text2Mel forward (TextEnc + AudioEnc + AudioDec eval stacks; routes
     fused_conv_ln_act / fused_hc when use_pallas=True)
  2. SSRN forward (incl. the C=1024 blocks that fall back to XLA by the
     VMEM gate)
  3. decode_step attention (ops/pallas_attention.monotonic_attention_step)
  4. one train step per network (fused HC custom-VJP)

Prints max |delta| per stage. Both paths run f32 with Precision.HIGHEST
matmuls (TPU DEFAULT silently demotes f32 dots to one-pass bf16 — in XLA
*and* in Mosaic), so agreement should be ~1e-5 at full stack depth.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

from dc_tts_tpu.config import base_config
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.train.steps import (init_ssrn_state, init_text2mel_state,
                                    make_ssrn_step, make_text2mel_step)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def tree_maxdiff(a, b):
    leaves = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))), a, b)
    return max(jax.tree.leaves(leaves))


def main():
    cfg_off = base_config()
    cfg_on = cfg_off.replace(use_pallas=True)
    mark(f"platform {jax.devices()[0].platform}")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B, N, T = 8, cfg_off.max_N, cfg_off.max_T
    ids = np.asarray(jax.random.randint(k3, (B, N), 1, cfg_off.vocab_size),
                     np.int32)
    S = np.asarray(jax.random.uniform(k4, (B, T, cfg_off.n_mels)), np.float32)

    t2m_off, t2m_on = Text2Mel(cfg_off), Text2Mel(cfg_on)
    p1 = t2m_off.init(k1)

    # compare the full pytree of Text2Mel.apply outputs
    f_off = jax.jit(lambda p, i, s: t2m_off.apply(p, i, s))
    f_on = jax.jit(lambda p, i, s: t2m_on.apply(p, i, s))
    out_off = jax.tree.leaves(f_off(p1, ids, S))
    out_on = jax.tree.leaves(f_on(p1, ids, S))
    d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip(out_off, out_on))
    mark(f"text2mel forward   max|d| = {d:.3e}")

    ssrn_off, ssrn_on = SSRN(cfg_off), SSRN(cfg_on)
    p2 = ssrn_off.init(k2)
    Y = np.asarray(jax.random.uniform(k4, (B, T, cfg_off.n_mels)), np.float32)
    g_off = jax.jit(lambda p, y: ssrn_off.apply(p, y))
    g_on = jax.jit(lambda p, y: ssrn_on.apply(p, y))
    z_off = jax.tree.leaves(g_off(p2, Y))
    z_on = jax.tree.leaves(g_on(p2, Y))
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(z_off, z_on))
    mark(f"ssrn forward       max|d| = {d:.3e}")

    # decode (incremental loop w/ pallas attention + step convs)
    dec_off = jax.jit(lambda p, i: t2m_off.decode(p, i)[0])
    dec_on = jax.jit(lambda p, i: t2m_on.decode(p, i)[0])
    y_off = dec_off(p1, ids)
    y_on = dec_on(p1, ids)
    d = float(jnp.max(jnp.abs(y_off - y_on)))
    mark(f"incremental decode max|d| = {d:.3e}")

    # train steps
    for which, mk, init in (("t2m", make_text2mel_step, init_text2mel_state),
                            ("ssrn", make_ssrn_step, init_ssrn_state)):
        kk = jax.random.PRNGKey(5)
        if which == "t2m":
            batch = {"texts": ids, "mels": S,
                     "text_lens": np.full((B,), int(N * 0.6), np.int32),
                     "mel_lens": np.full((B,), int(T * 0.8), np.int32)}
        else:
            batch = {"mels": S,
                     "mags": np.asarray(jax.random.uniform(
                         k3, (B, T * cfg_off.r, cfg_off.n_freq)), np.float32)}
        st_off = init(cfg_off, kk)
        st_on = init(cfg_on, kk)
        rng = jax.random.PRNGKey(1)
        s1, m1 = jax.jit(mk(cfg_off))(st_off, batch, rng)
        s2, m2 = jax.jit(mk(cfg_on))(st_on, batch, rng)
        dl = abs(float(m1["loss"]) - float(m2["loss"]))
        dp = tree_maxdiff(s1.params, s2.params)
        mark(f"{which} train step   |d loss| = {dl:.3e}  "
             f"max|d params| = {dp:.3e}")

    mark("done")


if __name__ == "__main__":
    main()
