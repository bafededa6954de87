"""Pin dsp/mel.py against librosa's actual filterbank algorithm.

The reference builds its mel basis with ``librosa.filters.mel(hp.sr,
hp.n_fft, hp.n_mels)`` (/root/reference/utils.py:50). librosa itself is NOT
installed in this image (and cannot be installed), so verbatim execution is
impossible; the strongest available pin is threefold:

1. ``_librosa_mel_oracle`` below is a line-by-line transcription of
   librosa's source (librosa/filters.py ``mel`` + librosa/core/convert.py
   ``mel_frequencies``/``hz_to_mel``/``mel_to_hz``, htk=False,
   norm="slaney" — the defaults the 2018-era positional call used). It is
   deliberately structured like librosa's code (per-filter loop,
   np.subtract.outer), NOT like dc_tts_tpu/dsp/mel.py's vectorized
   difference-of-ramps, so a transcription mistake in one is unlikely to be
   reproduced in the other.
2. A committed fixture (tests/goldens/mel_basis.npz) generated ONCE from
   the oracle pins the production matrix: perturbing any constant in
   dsp/mel.py (break frequency, logstep, normalization) goes red here.
3. Structural spot checks that are true of librosa's output by
   construction (documented values, not derived from either impl).
"""
import os

import numpy as np
import pytest

from dc_tts_tpu.dsp.mel import mel_filterbank

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "mel_basis.npz")


# --------------------------------------------------------------------------
# librosa transcription oracle (source: librosa/filters.py::mel and
# librosa/core/convert.py, htk=False, norm="slaney")

def _hz_to_mel(frequencies):
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if frequencies.ndim:
        log_t = frequencies >= min_log_hz
        mels[log_t] = min_log_mel + np.log(
            frequencies[log_t] / min_log_hz) / logstep
    elif frequencies >= min_log_hz:
        mels = min_log_mel + np.log(frequencies / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t]
                                                      - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def _mel_frequencies(n_mels, fmin, fmax):
    min_mel = _hz_to_mel(fmin)
    max_mel = _hz_to_mel(fmax)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return _mel_to_hz(mels)


def _librosa_mel_oracle(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    if fmax is None:
        fmax = float(sr) / 2
    weights = np.zeros((n_mels, int(1 + n_fft // 2)), dtype=np.float64)
    # librosa fft_frequencies: np.linspace(0, sr/2, 1 + n_fft//2)
    fftfreqs = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2),
                           endpoint=True)
    mel_f = _mel_frequencies(n_mels + 2, fmin=fmin, fmax=fmax)
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # norm="slaney" area normalization
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, np.newaxis]
    return weights


# --------------------------------------------------------------------------

CONFIGS = [(22050, 2048, 80),   # production (reference hyperparams.py)
           (8000, 256, 12),     # tests' tiny config
           (16000, 512, 40)]    # an unrelated shape


@pytest.mark.parametrize("sr,n_fft,n_mels", CONFIGS)
def test_matches_librosa_transcription(sr, n_fft, n_mels):
    ours = mel_filterbank(sr, n_fft, n_mels)
    ref = _librosa_mel_oracle(sr, n_fft, n_mels)
    # ours is float32 (it feeds the MXU); librosa returns float64 —
    # the reference's downstream .astype(float32) makes ~1e-7 rel
    # equivalence the right bar.
    np.testing.assert_allclose(ours, ref.astype(np.float32),
                               rtol=0, atol=2e-7 * ref.max())


def test_matches_committed_golden():
    """The production matrix is pinned byte-for-byte to a committed fixture
    generated from the librosa transcription oracle (tests/goldens/regen.py
    regenerates it — only do that for a DELIBERATE semantic change)."""
    gold = np.load(GOLDEN)["basis_22050_2048_80"]
    ours = mel_filterbank(22050, 2048, 80)
    np.testing.assert_allclose(ours, gold, rtol=0, atol=2e-7 * gold.max())


def test_structural_librosa_facts():
    """Facts true of librosa's matrix by construction, independent of both
    implementations' internals."""
    fb = mel_filterbank(22050, 2048, 80).astype(np.float64)
    n_freq = 1025
    fftfreqs = np.linspace(0, 11025.0, n_freq)
    # Slaney mel scale is LINEAR below 1 kHz: with fmin=0, fmax=11025 the
    # first filters' center frequencies are equally spaced in Hz.
    centers = fftfreqs[np.argmax(fb, axis=1)]
    spacing = np.diff(centers[:10])
    assert spacing.std() < 0.35 * spacing.mean()
    # Slaney normalization: each row integrates (in Hz) to ~2/width * area
    # of a unit triangle * width = 1 -> row integral == 1 (approximately,
    # up to the frequency grid). Equivalent: row_sum * df ~= 1.
    df = fftfreqs[1] - fftfreqs[0]
    row_int = fb.sum(axis=1) * df
    # coarse-grid quantization loosens the narrow low filters
    assert np.all(row_int > 0.55) and np.all(row_int < 1.45)
    # filters tile [0, fmax]: every interior bin is covered by >=1 filter
    coverage = fb.sum(axis=0)
    lo = np.searchsorted(fftfreqs, 100.0)
    assert np.all(coverage[lo:-1] > 0)
