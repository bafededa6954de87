"""Full-size forward parity check against the executing reference.

Same machinery as tf_oracle_export.py but at the reference's REAL
configuration (d=256, c=512, n_mels=80, max_N=180, max_T=210): builds the
reference's synthesize-mode graph, runs one forward pass on fixed inputs,
converts the ~25M-parameter variable set through convert.py, and asserts
this framework reproduces K/V/Q/Y/Z at full scale — catching numerics that
only appear at real accumulation depths/widths (the tiny golden fixture in
tests/ covers the code paths; this covers the scale).

Too large to commit as a fixture (~100 MB of weights), so it is a script,
not a test: run on demand, prints PASS/FAIL per tensor.

    python scripts/tf_parity_full.py
"""
from __future__ import annotations

import sys
import types

import numpy as np

import tf_oracle_export as gen  # noqa: F401  (sibling module)


def main():
    v1 = gen.install_tf1_shim()
    sys.modules["librosa"] = types.ModuleType("librosa")
    sys.path.insert(0, gen.REFERENCE)
    import hyperparams
    hp = hyperparams.Hyperparams
    hp.dropout_rate = 0.0  # inference anyway; belt and braces

    import train as ref_train

    rng = np.random.RandomState(0)
    B = 2
    L = np.zeros((B, hp.max_N), np.int32)
    lens = [121, 64]
    for b in range(B):
        L[b, :lens[b]] = rng.randint(2, len(hp.vocab), size=lens[b])
        L[b, lens[b]] = 1
    mels = rng.rand(B, hp.max_T, hp.n_mels).astype(np.float32)
    prev = np.array([0, 5], np.int32)

    g1 = v1.Graph()
    with g1.as_default():
        v1.set_random_seed(0)
        g = ref_train.Graph(mode="synthesize")
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            brng = np.random.RandomState(123)
            sess.run([v.assign(brng.uniform(-0.1, 0.1, v.shape.as_list())
                               .astype(np.float32))
                      for v in v1.trainable_variables()
                      if v.name.split(":")[0].endswith("/bias")])
            tvars = v1.trainable_variables()
            names = [v.name.split(":")[0] for v in tvars]
            var_map = dict(zip(names, sess.run(tvars)))
            feed = {g.L: L, g.mels: mels, g.prev_max_attentions: prev}
            ref = sess.run({"K": g.K, "V": g.V, "Q": g.Q, "Y": g.Y,
                            "max_attentions": g.max_attentions,
                            "Z": g.Z}, feed)

    # ---- our side (pure JAX on CPU; full base_config geometry)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    sys.path.insert(0, gen.HERE + "/..")
    from dc_tts_tpu import convert
    from dc_tts_tpu.config import base_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.train.steps import teacher_forcing_shift

    cfg = base_config().replace(ln_eps=1e-12, dropout_rate=0.0)
    t2m_p, ssrn_p = convert.convert(var_map, cfg)
    t2m = Text2Mel(cfg)
    K, V = t2m.text_encode(t2m_p, L)
    S = teacher_forcing_shift(jnp.asarray(mels))
    Q = t2m.audio_encode(t2m_p, S)
    _, Y, _, maxatt = t2m.apply(t2m_p, L, S, monotonic=True,
                                prev_max_attentions=jnp.asarray(prev))
    _, Z = SSRN(cfg).apply(ssrn_p, jnp.asarray(ref["Y"]))

    ok = True
    for name, ours, tol in [("K", K, 2e-4), ("V", V, 2e-4), ("Q", Q, 2e-4),
                            ("Y", Y, 2e-4), ("Z", Z, 2e-4)]:
        diff = np.max(np.abs(np.asarray(ours) - ref[name]))
        good = diff < tol
        ok &= good
        print(f"{name:3s} max|diff| = {diff:.3e}  "
              f"{'PASS' if good else 'FAIL'} (tol {tol:g})")
    same = int((np.asarray(maxatt) == ref["max_attentions"]).mean() * 100)
    print(f"max_attentions agreement: {same}%")
    ok &= same >= 99
    print("FULL-SIZE PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
