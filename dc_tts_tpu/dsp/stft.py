"""Device-resident STFT / iSTFT.

The reference runs these on host CPU through librosa
(``/root/reference/utils.py:41-44`` stft, ``utils.py:109-114`` istft), which
makes its Griffin-Lim loop host-bound. Here both transforms are pure JAX:

- framing is a static gather (index matrix precomputed at trace time),
- the FFT is ``jnp.fft.rfft`` (XLA FFT on TPU),
- overlap-add is a static scatter-add,

so the whole 50-iteration Griffin-Lim loop runs on-device inside one jit
(see ``griffin_lim.py``). Conventions match librosa's defaults as used by the
reference: center=True (reflect pad by n_fft//2), periodic Hann of
``win_length`` zero-padded symmetrically to ``n_fft``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of win_length, centered in an n_fft buffer (float32)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    pad = n_fft - win_length
    lpad = pad // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad: lpad + win_length] = w
    return out.astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop: int) -> int:
    """Frame count for a centered STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop


def frame_indices(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """(n_frames, n_fft) int32 gather indices into the padded signal."""
    return (np.arange(n_frames)[:, None] * hop
            + np.arange(n_fft)[None, :]).astype(np.int32)


def stft(y: jax.Array, n_fft: int, hop: int, win_length: int) -> jax.Array:
    """Centered STFT. y: (..., n_samples) -> complex64 (..., n_frames, n_freq).

    Matches the reference's librosa call (utils.py:41-44) up to FFT rounding:
    reflect-pad by n_fft//2, frame at `hop`, multiply by the centered Hann,
    rfft. Output frame-major (time, freq) — note librosa returns (freq, time);
    we keep time-major throughout because (T, C) layouts are what the rest of
    the framework and the TPU tiling want, and transpose only at the host
    boundary if ever needed.
    """
    pad = n_fft // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n = y.shape[-1]
    f = num_frames(n - 2 * pad, n_fft, hop)
    idx = jnp.asarray(frame_indices(f, n_fft, hop))
    frames = y[..., idx]                       # (..., F, n_fft) gather
    win = jnp.asarray(hann_window(win_length, n_fft))
    return jnp.fft.rfft(frames * win, axis=-1)


def istft(S: jax.Array, n_fft: int, hop: int, win_length: int,
          length: int | None = None) -> jax.Array:
    """Inverse STFT with NOLA window-sum normalization.

    S: (..., n_frames, n_freq) complex -> (..., n_samples) float32.
    Matches librosa.istft semantics (reference utils.py:109-114): windowed
    irfft frames, overlap-add, divide by the summed squared window, trim the
    centering pad of n_fft//2 from both ends.
    """
    f = S.shape[-2]
    frames = jnp.fft.irfft(S, n=n_fft, axis=-1)
    win = jnp.asarray(hann_window(win_length, n_fft))
    frames = frames * win

    total = n_fft + hop * (f - 1)
    idx = jnp.asarray(frame_indices(f, n_fft, hop))

    batch_shape = S.shape[:-2]
    flat = frames.reshape((-1, f, n_fft))

    def _ola(fr):
        return jnp.zeros(total, frames.dtype).at[idx].add(fr)

    y = jax.vmap(_ola)(flat).reshape(batch_shape + (total,))

    # window-sum normalization (same squared-Hann OLA librosa applies)
    wsq = jnp.zeros(total, win.dtype).at[idx].add(
        jnp.broadcast_to(win * win, (f, n_fft)))
    y = y / jnp.where(wsq > 1e-11, wsq, 1.0)

    pad = n_fft // 2
    y = y[..., pad: total - pad]
    if length is not None:
        y = y[..., :length]
    return y
