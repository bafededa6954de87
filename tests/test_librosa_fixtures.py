"""Pin the production DSP against REAL-librosa fixtures, when available.

librosa cannot be installed in the dev image, so the standing pins are
source transcriptions (tests/test_mel_golden.py, test_dsp.py). The moment
an environment with librosa exists, run

    python scripts/librosa_oracle_export.py

commit ``tests/goldens/librosa_fixtures.npz``, and this whole module
un-skips — closing the residual transcription-fidelity risk the VERDICT
keeps on the books. Reference oracle: /root/reference/utils.py:20-114.
"""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "goldens",
                       "librosa_fixtures.npz")

# production STFT geometry — derived like the reference derives it at
# runtime (int(sr*frame_shift) = 275; its "=276" source comment is wrong)
from dc_tts_tpu.config import base_config
_CFG = base_config()
HOP, WIN = _CFG.hop_length, _CFG.win_length

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="real-librosa fixtures not generated yet "
           "(run scripts/librosa_oracle_export.py off-image)")


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURE)


def test_mel_basis_matches_real_librosa(fx):
    from dc_tts_tpu.dsp.mel import mel_filterbank
    for sr, n_fft, n_mels in [(22050, 2048, 80), (8000, 256, 12),
                              (16000, 512, 40)]:
        key = f"basis_{sr}_{n_fft}_{n_mels}"
        ref = fx[key]
        ours = mel_filterbank(sr, n_fft, n_mels)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-7 * ref.max())


def test_features_match_real_librosa(fx):
    """trim -> preemph -> |STFT| -> mel -> dB -> norm vs utils.py:20-65."""
    from dc_tts_tpu.config import base_config
    from dc_tts_tpu.dsp.features_np import wav_to_spectrograms_np
    cfg = base_config()
    mel, mag = wav_to_spectrograms_np(fx["trimmed"], cfg)
    assert mel.shape == fx["mel"].shape and mag.shape == fx["mag"].shape
    # normalized-dB units in [0,1]; 1e-4 absolute ~= 0.01 dB
    np.testing.assert_allclose(mel, fx["mel"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(mag, fx["mag"], rtol=0, atol=1e-4)


def test_stft_magnitude_matches_real_librosa(fx):
    import jax.numpy as jnp
    from dc_tts_tpu.dsp.stft import stft
    y = fx["trimmed"].astype(np.float32)
    y = np.append(y[0], y[1:] - 0.97 * y[:-1]).astype(np.float32)
    S = stft(jnp.asarray(y), 2048, HOP, WIN, method="fft")
    np.testing.assert_allclose(np.abs(np.asarray(S)), fx["stft_mag"],
                               rtol=0, atol=2e-4 * fx["stft_mag"].max())


def test_istft_matches_real_librosa(fx):
    import jax.numpy as jnp
    from dc_tts_tpu.dsp.stft import istft
    spec = (fx["istft_in_re"] + 1j * fx["istft_in_im"]).astype(np.complex64)
    ours = np.asarray(istft(jnp.asarray(spec.T), 2048, HOP, WIN))
    ref = fx["istft_out"]
    n = min(len(ours), len(ref))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours[:n], ref[:n], rtol=0, atol=1e-4 * scale)


def test_griffin_lim_matches_real_librosa(fx):
    """Full vocoder vs utils.py:67-114. GL is a fixed-point iteration whose
    per-round f32-vs-f64 drift compounds, so the pin is perceptual-strength:
    per-frame spectral envelopes of the two waveforms agree closely."""
    import jax.numpy as jnp
    from dc_tts_tpu.config import base_config
    from dc_tts_tpu.dsp.griffin_lim import spectrogram_to_wav
    from dc_tts_tpu.dsp.stft import stft
    cfg = base_config()
    ours = np.asarray(spectrogram_to_wav(jnp.asarray(fx["mag"]), cfg))

    def mag_of(w):
        return np.abs(np.asarray(stft(jnp.asarray(w[: len(fx["gl_wav"])]),
                                      2048, HOP, WIN)))

    a, b = mag_of(ours), mag_of(fx["gl_wav"])
    t = min(a.shape[0], b.shape[0])
    rel = np.linalg.norm(a[:t] - b[:t]) / np.linalg.norm(b[:t])
    assert rel < 0.15, f"spectral relative error {rel:.3f}"
