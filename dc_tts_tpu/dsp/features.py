"""Spectrogram feature extraction and pre/de-emphasis filters.

Reproduces the reference's feature math (``/root/reference/utils.py:20-65``
``get_spectrograms`` and ``utils.py:147-162`` ``load_spectrograms``) as pure
JAX on device: preemphasis FIR, STFT magnitude, mel projection (one MXU
matmul), dB conversion, normalization, and the r-factor mel decimation that
couples Text2Mel (T/r frames) to SSRN (T frames).

The de-preemphasis IIR (reference uses ``scipy.signal.lfilter([1],[1,-a])``,
utils.py:89) is a first-order linear recurrence — implemented as a blocked
triangular-Toeplitz matmul (MXU) with a tiny cross-block carry scan, rather
than a length-n sequential filter or a full-length parallel prefix scan
(measured: associative_scan over the 232k-sample synthesis batch costs
~1.3 s/call on a v5e chip; one (n/L, L)x(L, L) matmul is ~ms).
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


@functools.lru_cache(maxsize=8)
def _iir_toeplitz(coef: float, L: int) -> np.ndarray:
    """(L, L) upper-triangular Toeplitz K[j, i] = coef^(i-j) for i >= j, so
    that (x_block @ K)[i] = sum_{j<=i} coef^(i-j) x[j] — one block of the
    first-order IIR as a matmul."""
    idx = np.arange(L)
    p = idx[None, :] - idx[:, None]
    K = np.where(p >= 0, coef ** np.maximum(p, 0), 0.0)
    return K.astype(np.float32)


def deemphasis(x: jax.Array, coef: float, block: int = 512) -> jax.Array:
    """Inverse filter y[t] = x[t] + coef*y[t-1], blocked for the MXU.

    Equivalent to scipy.signal.lfilter([1], [1, -coef], x) (utils.py:89):
    y[t] = sum_{k<=t} coef^(t-k) x[k]. Split t into blocks of L: within a
    block the sum is a triangular-Toeplitz matmul; across blocks the only
    coupling is the scalar carry c_f = y[last of block f], itself a
    first-order recurrence over n/L elements (c_f = coef^L c_{f-1} + local
    last), handled by a small associative scan. Matmul precision is pinned
    to HIGHEST so TPU keeps full f32 mantissas.
    """
    x = x.astype(jnp.float32)
    n = x.shape[-1]
    L = min(block, max(1, n))
    F = -(-n // L)
    pad = F * L - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = xp.reshape(x.shape[:-1] + (F, L))
    K = jnp.asarray(_iir_toeplitz(coef, L))
    local = jax.lax.dot_general(
        xb, K, (((xb.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    # carry recurrence over blocks: c_f = a^L * c_{f-1} + local[f, -1]
    aL = jnp.full(local.shape[:-1], coef ** L)
    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r
    _, c = jax.lax.associative_scan(combine, (aL, local[..., -1]), axis=-1)
    # block f receives carry c_{f-1} decayed by coef^(i+1)
    prev = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    decay = jnp.asarray((coef ** np.arange(1, L + 1)).astype(np.float32))
    y = local + prev[..., None] * decay
    return y.reshape(x.shape[:-1] + (F * L,))[..., :n]


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
