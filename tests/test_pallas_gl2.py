"""Whole-loop fused Griffin-Lim kernel (ops/pallas_gl2.py), interpret mode.

The kernel reproduces, per round, the exact reference semantics
(/root/reference/utils.py:96-114): istft (OLA + NOLA + center trim) ->
reflect pad -> stft -> phase normalize -> re-impose — so a single round is
pinned against the XLA "dft" round at f32 tolerance, and the full mixed-
precision schedule is pinned against dft_mixed's spectral-convergence
quality (the gate every GL throughput knob must pass, cf. test_dsp.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.dsp.stft import stft, istft, dft_consts
from dc_tts_tpu.ops.pallas_gl2 import (gl2_consts, gl2_geometry, gl2_run,
                                       pallas_gl2_supported, scramble_mag)

pytestmark = pytest.mark.skipif(not pallas_gl2_supported(),
                                reason="pallas unavailable")

# base-config-shaped ratios scaled down (P = ceil(512/69) = 8, as at
# production 2048/275); n_fft % 32 == 0 as the factorization needs
N_FFT, HOP, WIN_L, F, B = 512, 69, 275, 160, 2


def _consts(F_):
    return jax.tree.map(jnp.asarray, gl2_consts(N_FFT, HOP, WIN_L, F_))


def test_single_round_matches_xla_f32_round():
    """n_iter=1 (one HIGHEST round + final iSTFT) against the XLA f32
    'dft' path end to end — OLA, NOLA, trim/reflect edge mirroring, and
    both factored transform directions all inside the pin."""
    g = gl2_geometry(N_FFT, HOP, WIN_L, F)
    rng = np.random.default_rng(0)
    n_freq = N_FFT // 2 + 1
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32)) + 0.05

    m = jax.tree.map(jnp.asarray, dft_consts(N_FFT, "dft"))
    X = mag.astype(jnp.complex64)
    x_t = istft(X, N_FFT, HOP, WIN_L, method="dft", mats=m)
    est = stft(x_t, N_FFT, HOP, WIN_L, method="dft", mats=m)
    X1 = mag * (est / jnp.maximum(1e-8, jnp.abs(est)))
    y_ref = istft(X1, N_FFT, HOP, WIN_L, method="dft", mats=m)

    mag_scr = scramble_mag(mag, g, dtype=jnp.float32)
    y = gl2_run(mag_scr, _consts(F), g, n_iter=1, interpret=True)
    assert y.shape[-1] == y_ref.shape[-1]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=3e-6, rtol=0)


@pytest.mark.parametrize("F_", [F, F - 3])  # aligned + padded-F2 geometry
def test_quality_matches_dft_mixed(F_):
    """Full mixed schedule reaches dft_mixed's spectral-convergence floor
    on the bistable two-tone probe (incl. the bf16 magnitude carry)."""
    from dc_tts_tpu.dsp.griffin_lim import griffin_lim

    g = gl2_geometry(N_FFT, HOP, WIN_L, F_)
    t = np.arange(HOP * (F_ - 1) + N_FFT) / 22050.0
    y = (0.6 * np.sin(2 * np.pi * 440 * t)
         + 0.4 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(y), N_FFT, HOP, WIN_L))[None][:, :F_]

    def sc(wav):
        m_ = jnp.abs(stft(wav, N_FFT, HOP, WIN_L))[:, : mag.shape[1]]
        ref = mag[:, : m_.shape[1]]
        return float(jnp.linalg.norm(m_ - ref) / jnp.linalg.norm(ref))

    w_mixed = griffin_lim(mag, N_FFT, HOP, WIN_L, n_iter=12,
                          method="dft_mixed",
                          mats=jax.tree.map(jnp.asarray,
                                            dft_consts(N_FFT, "dft_mixed")))
    w2 = gl2_run(scramble_mag(mag, g), _consts(F_), g, n_iter=12,
                 interpret=True)
    assert w2.shape[-1] == w_mixed.shape[-1]
    s2, sm = sc(w2), sc(w_mixed)
    assert np.isfinite(s2)
    assert s2 < sm * 1.10 + 0.01, (s2, sm)


def test_method_dispatch_through_griffin_lim():
    """griffin_lim(method='dft_pallas2') — the production default path —
    rebuilds missing/mismatched consts (F_tag validation) and matches a
    direct gl2_run call exactly."""
    from dc_tts_tpu.dsp.griffin_lim import griffin_lim

    rng = np.random.default_rng(3)
    n_freq = N_FFT // 2 + 1
    mag = jnp.asarray(rng.random((1, F, n_freq), np.float32)) + 0.1
    g = gl2_geometry(N_FFT, HOP, WIN_L, F)

    direct = gl2_run(scramble_mag(mag, g), _consts(F), g, n_iter=3,
                     interpret=True)
    via = griffin_lim(mag, N_FFT, HOP, WIN_L, n_iter=3,
                      method="dft_pallas2")
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct),
                               atol=0, rtol=0)

    # consts built for a DIFFERENT frame count must be detected + rebuilt
    wrong = {"fused2": _consts(F + 8)}
    via2 = griffin_lim(mag, N_FFT, HOP, WIN_L, n_iter=3,
                       method="dft_pallas2", mats=wrong)
    np.testing.assert_allclose(np.asarray(via2), np.asarray(direct),
                               atol=0, rtol=0)


def test_unfactorable_n_fft_raises():
    with pytest.raises(ValueError):
        gl2_geometry(500, 69, 275, 32)


def test_extreme_overlap_geometry_edge_rows():
    """Regression (self-review r4): the edge-mirror scratch is sized from
    geometry. At n_fft >> hop (here 512/16: P=32, mirrors span 18 rows)
    the old hardcoded 16-row buffer overflowed. Pin one round against the
    XLA f32 path at such a geometry."""
    n_fft, hop, win_l, F_ = 512, 16, 275, 64
    g = gl2_geometry(n_fft, hop, win_l, F_)
    assert g.edge_rows > 16, "geometry no longer exercises the regression"
    rng = np.random.default_rng(5)
    mag = jnp.asarray(rng.random((1, F_, n_fft // 2 + 1), np.float32)) + 0.05

    m = jax.tree.map(jnp.asarray, dft_consts(n_fft, "dft"))
    X = mag.astype(jnp.complex64)
    x_t = istft(X, n_fft, hop, win_l, method="dft", mats=m)
    est = stft(x_t, n_fft, hop, win_l, method="dft", mats=m)
    X1 = mag * (est / jnp.maximum(1e-8, jnp.abs(est)))
    y_ref = istft(X1, n_fft, hop, win_l, method="dft", mats=m)

    consts = jax.tree.map(jnp.asarray, gl2_consts(n_fft, hop, win_l, F_))
    y = gl2_run(scramble_mag(mag, g, dtype=jnp.float32), consts, g,
                n_iter=1, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=3e-6, rtol=0)
