"""Spectrogram feature extraction and pre/de-emphasis filters.

Reproduces the reference's feature math (``/root/reference/utils.py:20-65``
``get_spectrograms`` and ``utils.py:147-162`` ``load_spectrograms``) as pure
JAX on device: preemphasis FIR, STFT magnitude, mel projection (one MXU
matmul), dB conversion, normalization, and the r-factor mel decimation that
couples Text2Mel (T/r frames) to SSRN (T frames).

The de-preemphasis IIR (reference uses ``scipy.signal.lfilter([1],[1,-a])``,
utils.py:89) is a first-order linear recurrence — implemented as a parallel
``associative_scan`` so it is O(log n) depth on the VPU instead of a
sequential host filter.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .mel import mel_filterbank
from .stft import stft


def preemphasis(y: jax.Array, coef: float) -> jax.Array:
    """y'[0]=y[0]; y'[t] = y[t] - coef*y[t-1]  (reference utils.py:38)."""
    return jnp.concatenate([y[..., :1], y[..., 1:] - coef * y[..., :-1]], axis=-1)


def deemphasis(x: jax.Array, coef: float) -> jax.Array:
    """Inverse filter y[t] = x[t] + coef*y[t-1] via parallel prefix scan.

    Equivalent to scipy.signal.lfilter([1], [1, -coef], x) (utils.py:89) but
    runs on device with O(log n) depth: each sample is an affine map
    y -> coef*y + x[t]; composing maps is associative.
    """
    a = jnp.full_like(x, coef)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, y = jax.lax.associative_scan(combine, (a, x), axis=-1)
    return y


@functools.partial(jax.jit, static_argnames=("cfg",))
def wav_to_spectrograms(y: jax.Array, cfg: Config) -> Tuple[jax.Array, jax.Array]:
    """Waveform (..., n) -> (mel (..., T, n_mels), mag (..., T, n_freq)).

    Matches reference utils.py:31-65 given the same (already loaded/trimmed)
    waveform: preemphasis -> |STFT| -> mel matmul -> 20*log10(max(1e-5, .))
    -> clip((db - ref + max)/max, 1e-8, 1) -> float32, time-major.
    """
    y = preemphasis(y.astype(jnp.float32), cfg.preemphasis)
    S = stft(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    mag = jnp.abs(S)                                   # (..., T, n_freq)
    basis = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels))
    mel = mag @ basis.T                                # (..., T, n_mels)

    def to_norm_db(x):
        db = 20.0 * jnp.log10(jnp.maximum(1e-5, x))
        return jnp.clip((db - cfg.ref_db + cfg.max_db) / cfg.max_db, 1e-8, 1.0)

    return to_norm_db(mel).astype(jnp.float32), to_norm_db(mag).astype(jnp.float32)


def reduce_mel(mel: np.ndarray, mag: np.ndarray, r: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad T to a multiple of r, decimate mel by taking every r-th frame.

    The r-factor coupling from reference utils.py:147-162: mel becomes
    (T/r, n_mels) while mag keeps full (T, n_freq).
    """
    t = mel.shape[-2]
    pad = (r - t % r) % r
    widths = [(0, 0)] * (mel.ndim - 2) + [(0, pad), (0, 0)]
    mel = np.pad(mel, widths, mode="constant")
    mag = np.pad(mag, widths, mode="constant")
    return mel[..., ::r, :], mag


def trim_silence(y: np.ndarray, top_db: float = 60.0,
                 frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Trim leading/trailing silence, librosa.effects.trim-style.

    The reference trims on load (utils.py:35) and after Griffin-Lim
    (utils.py:92). Host-side numpy: frame RMS -> dB relative to peak ->
    keep [first, last] frame above -top_db.
    """
    if y.size == 0:
        return y
    n = len(y)
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad), mode="constant")
    n_frames = 1 + n // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = yp[np.minimum(idx, len(yp) - 1)]
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=-1))
    ref = rms.max()
    if ref <= 0:
        return y
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    nonsilent = np.flatnonzero(db > -top_db)
    if nonsilent.size == 0:
        return y[:0]
    start = int(nonsilent[0]) * hop_length
    end = min(n, (int(nonsilent[-1]) + 1) * hop_length)
    return y[start:end]
