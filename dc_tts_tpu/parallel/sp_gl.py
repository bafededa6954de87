"""Sequence-parallel Griffin-Lim: shard the TIME-FRAME axis of the vocoder.

DP shards utterances; this shards a single long spectrogram's frames over
the mesh so the 50-iteration phase-reconstruction loop runs cooperatively.
Each iteration couples frames only within the OLA overlap of
``n_fft - hop`` samples, so per iteration each shard exchanges exactly one
boundary segment with each neighbor (lax.ppermute over ICI):

  istft side: my trailing OLA spill [F_l*hop, F_l*hop + n_fft - hop) adds
  into my right neighbor's head.
  stft side: my framing window reads n_fft - hop samples of my right
  neighbor's head.

Window-sum normalization uses the GLOBAL precomputed NOLA denominator
sliced per shard, and the global-edge reflect padding of the centered STFT
is applied locally by the first/last shards — making the sharded loop
numerically equivalent to the unsharded ``dsp.griffin_lim`` (tested to
float tolerance in tests/test_sp_gl.py).

Constraint: frames per shard must exceed the frame halo
ceil(n_fft/hop) - 1 (e.g. 841 frames over 8 shards = 105 >> 7 at base
config).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..dsp.stft import (_frame_signal, _overlap_add, dft_consts,
                        hann_window, irdft, rdft)
from ..dsp.features import deemphasis


@functools.lru_cache(maxsize=8)
def _global_winsum_inv(n_frames: int, n_fft: int, hop: int,
                       win_length: int) -> np.ndarray:
    win = hann_window(win_length, n_fft).astype(np.float64)
    total = n_fft + hop * (n_frames - 1)
    wsq = np.zeros(total)
    for f in range(n_frames):
        wsq[f * hop: f * hop + n_fft] += win * win
    wsq[wsq <= 1e-11] = 1.0
    return (1.0 / wsq).astype(np.float32)


def _shift_from_left(x, axis):
    """Receive x from the LEFT neighbor (shard 0 gets zeros)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i, i + 1) for i in range(n - 1)])


def _shift_from_right(x, axis):
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i + 1, i) for i in range(n - 1)])


def _sp_gl_local(mag_local, winsum_inv_global, mats, *, n_fft, hop,
                 win_length, n_iter, f_local, n_shards, axis):
    """Shard-local Griffin-Lim body. mag_local (B, F_l, n_freq)."""
    win = jnp.asarray(hann_window(win_length, n_fft))
    idx = jax.lax.axis_index(axis)
    spill = n_fft - hop                      # boundary overlap in samples
    own = f_local * hop                      # samples owned per shard
    pad = n_fft // 2                         # centered-stft padding

    # per-shard slice of the global NOLA denominator (own + spill samples)
    wsi = jax.lax.dynamic_slice(winsum_inv_global, (idx * own,),
                                (own + spill,))

    is_first = idx == 0
    is_last = idx == n_shards - 1

    def istft_local(X):
        """X (B,F_l,freq) -> y_ext (B, own+spill) normalized samples in
        global padded coordinates [idx*own, idx*own + own + spill)."""
        frames = irdft(X, n_fft, "dft", mats) * win
        y = _overlap_add(frames, hop)                    # (B, own + spill)
        incoming = _shift_from_left(y[..., own:], axis)  # left spill -> my head
        y = y.at[..., :spill].add(incoming)
        # my own tail ALSO needs my right neighbor's... no: neighbor's head
        # contributions to my tail region belong to the neighbor's samples.
        # The spill tail section [own, own+spill) is only canonical for the
        # last shard; refresh it from the right neighbor's (already-summed)
        # head so framing below reads correct values.
        head_next = _shift_from_right(y[..., :spill], axis)
        y = jnp.where(is_last, y,
                      jnp.concatenate([y[..., :own], head_next], axis=-1))
        return y * wsi

    def stft_local(y_ext):
        """y_ext (B, own+spill) -> complex frames (B, F_l, n_freq).

        Global frame f starts at sample f*hop of the padded signal, so
        local frame j starts at j*hop within y_ext — no left halo needed;
        the right halo is the spill section already refreshed above.
        Global-edge reflect padding: the unsharded stft reflects around the
        TRIMMED signal's edges; in padded coordinates head[k] = y[2*pad-k]
        and tail[m] = y[total-pad-2-m], both local to the first/last shard
        (pad << own).
        """
        y = y_ext
        ext = own + spill
        head = y[..., pad + 1: 2 * pad + 1][..., ::-1]
        y = jnp.where(is_first,
                      jnp.concatenate([head, y[..., pad:]], axis=-1), y)
        tail = y[..., ext - 2 * pad - 1: ext - pad - 1][..., ::-1]
        y = jnp.where(is_last,
                      jnp.concatenate([y[..., : ext - pad], tail], axis=-1),
                      y)
        frames = _frame_signal(y, f_local, n_fft, hop)
        return rdft(frames * win, n_fft, "dft", mats)

    X = mag_local.astype(jnp.complex64)
    mag = mag_local

    def body(_, X):
        y = istft_local(X)
        est = stft_local(y)
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        return mag * phase

    X = jax.lax.fori_loop(0, n_iter, body, X)
    return istft_local(X)


def griffin_lim_sp(mag: jax.Array, cfg: Config, mesh: Mesh,
                   axis: str = "data", n_iter: Optional[int] = None
                   ) -> jax.Array:
    """Time-sharded Griffin-Lim. mag (B, T, n_freq) with T % axis_size == 0.

    Returns (B, samples) waveform in padded coordinates trimmed like the
    unsharded path. Output is replicated (all-gathered at the end).
    """
    n_iter = cfg.n_iter if n_iter is None else n_iter
    n_shards = mesh.shape[axis]
    B, F, n_freq = mag.shape
    if F % n_shards:
        raise ValueError(f"time-sharded GL needs the frame count to divide "
                         f"by the shard count, got F={F}, shards={n_shards}")
    f_local = F // n_shards
    spill = cfg.n_fft - cfg.hop_length
    if f_local * cfg.hop_length <= spill:
        raise ValueError(
            f"time-shard too fine for the OLA halo: each shard owns "
            f"{f_local} frames = {f_local * cfg.hop_length} samples, but "
            f"the overlap halo is n_fft - hop = {spill} samples; use at "
            f"most {F * cfg.hop_length // (spill + 1)} shards at this "
            f"geometry")

    winsum_inv = jnp.asarray(_global_winsum_inv(
        F, cfg.n_fft, cfg.hop_length, cfg.win_length))

    def local(mag_local, wsi, mats):
        y = _sp_gl_local(mag_local, wsi, mats, n_fft=cfg.n_fft,
                         hop=cfg.hop_length, win_length=cfg.win_length,
                         n_iter=n_iter, f_local=f_local,
                         n_shards=n_shards, axis=axis)
        # drop the spill tail except on the last shard; gather samples
        return y

    y_sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis))(mag, winsum_inv,
                                 dft_consts(cfg.n_fft, "dft"))
    # y_sharded (B, n_shards*(own+spill)) concatenates per-shard extended
    # segments; stitch: take own samples from each shard + the last spill.
    own = f_local * cfg.hop_length
    segs = y_sharded.reshape(B, n_shards, own + spill)
    body = segs[:, :, :own].reshape(B, n_shards * own)
    tail = segs[:, -1, own:]
    y = jnp.concatenate([body, tail], axis=-1)
    pad = cfg.n_fft // 2
    total = cfg.n_fft + cfg.hop_length * (F - 1)
    return y[..., pad: total - pad]


def time_sharded_vocoder(mag_norm: jax.Array, cfg: Config, mesh: Mesh,
                         axis: str = "data") -> jax.Array:
    """Normalized linear spectrogram (B, T, n_freq) in [0,1] -> waveform,
    with the Griffin-Lim frame axis sharded over ``mesh[axis]``.

    The time-sharded counterpart of ``dsp.griffin_lim.spectrogram_to_wav``
    (reference utils.py:67-92): same dB denormalization, ``power``
    sharpening, Griffin-Lim, and de-preemphasis IIR — but the 50-round
    loop runs cooperatively across devices with per-iteration halo
    exchanges (``griffin_lim_sp``), the long-utterance scaling story DP's
    per-utterance sharding cannot cover. CLI: ``synthesize --time-shard``.
    """
    from ..dsp.griffin_lim import denormalize_mag
    wav = griffin_lim_sp(denormalize_mag(mag_norm, cfg), cfg, mesh,
                         axis=axis)
    return deemphasis(wav, cfg.preemphasis).astype(jnp.float32)
