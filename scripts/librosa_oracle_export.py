"""Export REAL-librosa DSP fixtures — run this in any environment where
librosa + scipy install (they cannot be installed in the dev image; see
PARITY.md). This is the first thing to run off-image.

Provenance of the current pins (what this script replaces): the mel
filterbank is pinned to a line-by-line transcription of librosa's source
(tests/test_mel_golden.py), and the STFT/Griffin-Lim path is pinned to the
numpy-pocketfft transcription used by scripts/tf_reference_baseline.py.
Those transcriptions carry a residual fidelity risk that only executing the
real library removes. Running this script writes
``tests/goldens/librosa_fixtures.npz``; ``tests/test_librosa_fixtures.py``
then un-skips and pins the production DSP against the real library.

Every call below mirrors the reference verbatim:
  - mel basis:       librosa.filters.mel(sr, n_fft, n_mels)   (utils.py:50)
  - features:        trim -> preemphasis -> stft -> |.| -> mel -> dB -> norm
                     (utils.py:20-65, minus the file load)
  - vocoder:         denorm -> amp -> **1.5 -> griffin_lim(50) -> istft ->
                     de-preemphasis lfilter -> trim              (utils.py:67-114)

Usage:  pip install librosa==0.9.2 scipy && python scripts/librosa_oracle_export.py
(The reference predates librosa 0.10's keyword-only API; 0.9.x accepts the
positional calls used here, exactly as the reference wrote them.)
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "librosa_fixtures.npz")

# reference hyperparams (hyperparams.py:13-18). HOP/WIN are DERIVED the
# way the reference derives them at runtime — int(sr*frame_shift) = 275 —
# NOT the "=276" its source comment claims (the comment is wrong; 275 is
# also what Config.hop_length computes, so fixtures line up with the
# production geometry).
SR, N_FFT = 22050, 2048
HOP, WIN = int(SR * 0.0125), int(SR * 0.05)  # 275, 1102
N_MELS, PREEMPH, MAX_DB, REF_DB, POWER, N_ITER = 80, 0.97, 100, 20, 1.5, 50

MEL_CONFIGS = [(22050, 2048, 80), (8000, 256, 12), (16000, 512, 40)]


def synth_wav(seconds: float = 1.2, seed: int = 0) -> np.ndarray:
    """Deterministic speech-like test signal: an f0 sweep with harmonics,
    amplitude-modulated, plus a silent head/tail so trim() has work to do."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 110.0 + 60.0 * np.sin(2 * np.pi * 1.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    y = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(5))
    y *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t) ** 2
    y += 0.003 * rng.standard_normal(n)
    sil = np.zeros(int(0.08 * SR))
    y = np.concatenate([sil, y, sil]).astype(np.float32)
    return 0.9 * y / np.abs(y).max()


def main():
    try:
        import librosa
        from scipy import signal
    except ImportError as e:
        print(f"librosa/scipy not available here ({e}); run this script in an "
              "environment where `pip install librosa scipy` works.")
        return 1

    fx = {}

    for sr, n_fft, n_mels in MEL_CONFIGS:
        fx[f"basis_{sr}_{n_fft}_{n_mels}"] = librosa.filters.mel(
            sr, n_fft, n_mels).astype(np.float32)

    wav = synth_wav()
    fx["wav"] = wav

    # --- get_spectrograms (utils.py:20-65) on the synthetic waveform
    y, _ = librosa.effects.trim(wav)
    fx["trimmed"] = y.astype(np.float32)
    y = np.append(y[0], y[1:] - PREEMPH * y[:-1])
    linear = librosa.stft(y=y, n_fft=N_FFT, hop_length=HOP, win_length=WIN)
    mag = np.abs(linear)
    fx["stft_mag"] = mag.T.astype(np.float32)  # (T, 1+n_fft//2), time-major
    mel_basis = librosa.filters.mel(SR, N_FFT, N_MELS)
    mel = np.dot(mel_basis, mag)
    mel = 20 * np.log10(np.maximum(1e-5, mel))
    magdb = 20 * np.log10(np.maximum(1e-5, mag))
    mel = np.clip((mel - REF_DB + MAX_DB) / MAX_DB, 1e-8, 1)
    magdb = np.clip((magdb - REF_DB + MAX_DB) / MAX_DB, 1e-8, 1)
    fx["mel"] = mel.T.astype(np.float32)
    fx["mag"] = magdb.T.astype(np.float32)

    # --- spectrogram2wav (utils.py:67-114) on the extracted mag
    m = fx["mag"].T.astype(np.float64)
    m = (np.clip(m, 0, 1) * MAX_DB) - MAX_DB + REF_DB
    m = np.power(10.0, m * 0.05)
    X_best = (m ** POWER).copy()
    spectrogram = X_best.copy()
    for _ in range(N_ITER):
        X_t = librosa.istft(X_best, HOP, win_length=WIN, window="hann")
        est = librosa.stft(X_t, N_FFT, HOP, win_length=WIN)
        phase = est / np.maximum(1e-8, np.abs(est))
        X_best = spectrogram * phase
    X_t = librosa.istft(X_best, HOP, win_length=WIN, window="hann")
    gl = np.real(X_t)
    gl = signal.lfilter([1], [1, -PREEMPH], gl)
    gl, _ = librosa.effects.trim(gl)
    fx["gl_wav"] = gl.astype(np.float32)

    # --- one deterministic istft for a tight single-transform pin
    rng = np.random.default_rng(1)
    spec = (rng.standard_normal((1 + N_FFT // 2, 40))
            + 1j * rng.standard_normal((1 + N_FFT // 2, 40)))
    fx["istft_in_re"] = np.real(spec).astype(np.float32)
    fx["istft_in_im"] = np.imag(spec).astype(np.float32)
    fx["istft_out"] = librosa.istft(
        spec.astype(np.complex64), HOP, win_length=WIN,
        window="hann").astype(np.float32)

    np.savez_compressed(OUT, **fx)
    print(f"wrote {OUT} ({len(fx)} arrays); commit it and run "
          "`pytest tests/test_librosa_fixtures.py -v`")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
