"""Fused Pallas Griffin-Lim round: parity + quality pins (interpret mode).

The fused round (ops/pallas_gl.py) must compute exactly what one XLA
``dft_bf16`` GL round computes — istft -> trim -> reflect-pad -> stft ->
phase-normalize -> reimpose (reference /root/reference/utils.py:96-114) —
with bf16 matmul operands and f32 accumulation. Only the in-tile reduction
order differs, so parity is pinned at bf16-noise tolerance against the
XLA round, and the full "dft_pallas" method is pinned against dft_mixed's
spectral-convergence quality on the bistable probe from test_dsp.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.dsp.stft import (_dft_mats, _idft_mats, hann_window, istft,
                                 stft, dft_consts)
from dc_tts_tpu.ops.pallas_gl import (fused_gl_round, gl_fused_consts,
                                      gl_geometry, pallas_gl_supported)

pytestmark = pytest.mark.skipif(not pallas_gl_supported(),
                                reason="pallas unavailable")

# a base-config-shaped geometry, scaled down: n_fft/hop/win ratios match
# production (2048/276/1102 -> P=8), F covers several tiles
N_FFT, HOP, WIN_L, F, B = 512, 69, 275, 160, 2


def _xla_bf16_round(X, mag, mb):
    x_t = istft(X, N_FFT, HOP, WIN_L, method="dft_bf16", mats=mb)
    est = stft(x_t, N_FFT, HOP, WIN_L, method="dft_bf16", mats=mb)
    phase = est / jnp.maximum(1e-8, jnp.abs(est))
    return mag * phase


@pytest.fixture(scope="module")
def consts():
    return jax.tree.map(jnp.asarray, gl_fused_consts(N_FFT, HOP, WIN_L, F))


def test_fused_round_matches_xla_bf16_round(consts):
    n_freq = N_FFT // 2 + 1
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32))
    Xr = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))
    Xi = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))

    Cb, Sb = _dft_mats(N_FFT, "bfloat16")
    Ab, Bb = _idft_mats(N_FFT, "bfloat16")
    mb = {"C": jnp.asarray(Cb), "S": jnp.asarray(Sb),
          "A": jnp.asarray(Ab), "B": jnp.asarray(Bb)}
    ref = _xla_bf16_round(jax.lax.complex(Xr, Xi), mag, mb)

    g = gl_geometry(N_FFT, HOP, WIN_L, F)
    pad_rows = ((0, 0), (0, g.f2 - F), (0, 0))
    got_r, got_i = fused_gl_round(jnp.pad(Xr, pad_rows),
                                  jnp.pad(Xi, pad_rows),
                                  jnp.pad(mag, pad_rows), consts, g,
                                  interpret=True)
    # same op set, different in-tile reduction order -> bf16-noise bar.
    # X entries are O(1); phase is a ratio so the error scale is mag-level.
    np.testing.assert_allclose(np.asarray(got_r[:, :F]), np.asarray(ref.real),
                               atol=2e-2, rtol=0)
    np.testing.assert_allclose(np.asarray(got_i[:, :F]), np.asarray(ref.imag),
                               atol=2e-2, rtol=0)
    # padded rows stay exactly zero (their mag is zero)
    assert float(jnp.abs(got_r[:, F:]).max()) == 0.0


def test_fused_round_padded_rows_do_not_leak(consts):
    """Zero rows beyond F must not change rows < F (halo reads cross the
    boundary): compare F vs F+tile geometries on identical content."""
    n_freq = N_FFT // 2 + 1
    rng = np.random.default_rng(1)
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32))
    Xr = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))
    Xi = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))

    g = gl_geometry(N_FFT, HOP, WIN_L, F)
    pr = ((0, 0), (0, g.f2 - F), (0, 0))
    a_r, a_i = fused_gl_round(jnp.pad(Xr, pr), jnp.pad(Xi, pr),
                              jnp.pad(mag, pr), consts, g, interpret=True)

    F_big = F + g.tf2
    g2 = gl_geometry(N_FFT, HOP, WIN_L, F_big)
    consts2 = jax.tree.map(jnp.asarray,
                           gl_fused_consts(N_FFT, HOP, WIN_L, F_big))
    pr2 = ((0, 0), (0, g2.f2 - F), (0, 0))
    b_r, b_i = fused_gl_round(jnp.pad(Xr, pr2), jnp.pad(Xi, pr2),
                              jnp.pad(mag, pr2), consts2, g2, interpret=True)
    # frames more than P left of the zero tail are unaffected by geometry
    interior = F - 2 * g.P
    np.testing.assert_allclose(np.asarray(a_r[:, :interior]),
                               np.asarray(b_r[:, :interior]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_i[:, :interior]),
                               np.asarray(b_i[:, :interior]), atol=1e-5)


def test_fused_consts_tight_fp1_geometry():
    """Regression: frame counts where fp1*hop < n_fft + hop*(F-1) — the
    full OLA support overruns the k1 output grid — used to crash
    gl_fused_consts with a broadcast ValueError (advisor r3). F=124 at the
    test geometry (and e.g. F=125 at production 2048/275) hits it. The
    truncated wsq tail lies beyond pad+L_sig, which the inter-kernel trim
    discards, so the fused round must still match the XLA round exactly."""
    F_tight = 124
    g = gl_geometry(N_FFT, HOP, WIN_L, F_tight)
    assert g.fp1 * HOP < N_FFT + HOP * (F_tight - 1), "geometry not tight"
    c = jax.tree.map(jnp.asarray, gl_fused_consts(N_FFT, HOP, WIN_L, F_tight))

    n_freq = N_FFT // 2 + 1
    rng = np.random.default_rng(7)
    mag = jnp.asarray(rng.random((1, F_tight, n_freq), np.float32))
    Xr = jnp.asarray(rng.standard_normal((1, F_tight, n_freq)).astype(np.float32))
    Xi = jnp.asarray(rng.standard_normal((1, F_tight, n_freq)).astype(np.float32))

    Cb, Sb = _dft_mats(N_FFT, "bfloat16")
    Ab, Bb = _idft_mats(N_FFT, "bfloat16")
    mb = {"C": jnp.asarray(Cb), "S": jnp.asarray(Sb),
          "A": jnp.asarray(Ab), "B": jnp.asarray(Bb)}
    ref = _xla_bf16_round(jax.lax.complex(Xr, Xi), mag, mb)

    pr = ((0, 0), (0, g.f2 - F_tight), (0, 0))
    got_r, got_i = fused_gl_round(jnp.pad(Xr, pr), jnp.pad(Xi, pr),
                                  jnp.pad(mag, pr), c, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r[:, :F_tight]),
                               np.asarray(ref.real), atol=2e-2, rtol=0)
    np.testing.assert_allclose(np.asarray(got_i[:, :F_tight]),
                               np.asarray(ref.imag), atol=2e-2, rtol=0)

    # the advisor's exact production-geometry crash case builds host-side
    prod = gl_fused_consts(2048, 275, 1102, 125)
    assert prod["wsq_seg"].dtype == np.float32


def test_fused_consts_f_mismatch_detected():
    """Consts carry their frame count (F_tag): passing consts built for a
    different F that happens to share the same fp1 bucket must be detected
    and rebuilt, not silently used with the wrong NOLA tail (advisor r3)."""
    from dc_tts_tpu.dsp.griffin_lim import griffin_lim
    from dc_tts_tpu.dsp.stft import dft_consts

    F_a, F_b = 152, 160  # same fp1 bucket at test geometry, different F
    ga, gb = gl_geometry(N_FFT, HOP, WIN_L, F_a), gl_geometry(N_FFT, HOP,
                                                              WIN_L, F_b)
    assert ga.fp1 == gb.fp1, "bucket assumption broken — pick new F_a/F_b"

    n_freq = N_FFT // 2 + 1
    rng = np.random.default_rng(3)
    mag = jnp.asarray(rng.random((1, F_a, n_freq), np.float32)) + 0.1

    base = dict(dft_consts(N_FFT, "dft_pallas"))
    right = dict(base)
    right["fused"] = gl_fused_consts(N_FFT, HOP, WIN_L, F_a)
    wrong = dict(base)
    wrong["fused"] = gl_fused_consts(N_FFT, HOP, WIN_L, F_b)

    kw = dict(n_iter=4, method="dft_pallas")
    w_right = griffin_lim(mag, N_FFT, HOP, WIN_L,
                          mats=jax.tree.map(jnp.asarray, right), **kw)
    w_wrong = griffin_lim(mag, N_FFT, HOP, WIN_L,
                          mats=jax.tree.map(jnp.asarray, wrong), **kw)
    # mismatched consts are rebuilt for the true F -> identical output
    np.testing.assert_allclose(np.asarray(w_wrong), np.asarray(w_right),
                               atol=0, rtol=0)


def test_dft_pallas_method_quality_matches_dft_mixed():
    """Full griffin_lim(method='dft_pallas') reaches the same spectral-
    convergence floor as dft_mixed on a two-tone probe (the quality pin
    that gates every GL throughput knob, cf. test_dsp.py)."""
    from dc_tts_tpu.dsp.griffin_lim import griffin_lim

    n_freq = N_FFT // 2 + 1
    t = np.arange(HOP * (F - 1) + N_FFT) / 22050.0
    y = (0.6 * np.sin(2 * np.pi * 440 * t)
         + 0.4 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(y), N_FFT, HOP, WIN_L))[None]

    def spectral_conv(wav):
        m = jnp.abs(stft(wav, N_FFT, HOP, WIN_L))[:, : mag.shape[1]]
        ref = mag[:, : m.shape[1]]
        return float(jnp.linalg.norm(m - ref) / jnp.linalg.norm(ref))

    kw = dict(n_iter=20)
    w_mixed = griffin_lim(mag, N_FFT, HOP, WIN_L, method="dft_mixed",
                          mats=jax.tree.map(jnp.asarray,
                                            dft_consts(N_FFT, "dft_mixed")),
                          **kw)
    w_pallas = griffin_lim(mag, N_FFT, HOP, WIN_L, method="dft_pallas",
                           **kw)
    sc_mixed = spectral_conv(w_mixed)
    sc_pallas = spectral_conv(w_pallas)
    assert np.isfinite(sc_pallas)
    # same floor within 10% relative — a broken fused round lands far off
    assert sc_pallas < sc_mixed * 1.10 + 0.01, (sc_pallas, sc_mixed)
