"""Device-resident STFT / iSTFT, engineered for the TPU.

The reference runs these on host CPU through librosa
(``/root/reference/utils.py:41-44`` stft, ``utils.py:109-114`` istft), which
makes its Griffin-Lim loop host-bound. Here both transforms are pure JAX and
shaped for the hardware:

* **No gathers or scatters.** TPU scatter/gather lowers to slow serialized
  ops. Framing and overlap-add are instead expressed with the staggered-
  stream trick: pad the frame length to P = ceil(n_fft/hop) hops, view the
  signal as (S, hop) segments, and a frame is P consecutive segments
  (framing = P static slices + stack), while overlap-add is the transpose
  (P shifted adds). Everything stays dense on the VPU.
* **Two transform backends**: XLA FFT (``method="fft"``), or DFT-as-matmul
  (``method="dft"``) which runs the (frames, n_fft) x (n_fft, n_freq)
  cos/sin products on the MXU — measured faster than XLA's TPU FFT for
  n_fft=2048 batches, and the building block the Griffin-Lim loop fuses
  around.

Conventions match librosa's defaults as used by the reference: center=True
(reflect pad n_fft//2), periodic Hann of win_length zero-padded symmetrically
to n_fft. Layout is time-major (..., frames, freq) throughout — (T, C) is
what both the models and the TPU tiling want.
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
    """(n_frames, n_fft) int32 indices into the padded signal (kept for
    tests/oracles; the fast path below never materializes a gather)."""
    return (np.arange(n_frames)[:, None] * hop
            + np.arange(n_fft)[None, :]).astype(np.int32)


# ---------------------------------------------------------------------------
# DFT matmul constants


@functools.lru_cache(maxsize=8)
def _dft_mats(n_fft: int, dtype_str: str = "float32"):
    """Forward rDFT as two real matmuls: X = x @ C + i * x @ S."""
    dtype = np.dtype(dtype_str)
    n = np.arange(n_fft)
    f = np.arange(n_fft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(n, f) / n_fft
    return (np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype))


@functools.lru_cache(maxsize=8)
def _idft_mats(n_fft: int, dtype_str: str = "float32"):
    """Inverse rDFT as two real matmuls: x = Re(X) @ A + Im(X) @ B.

    Standard rfft symmetry weights: DC and Nyquist count once, interior
    bins twice, all scaled 1/n_fft.
    """
    dtype = np.dtype(dtype_str)
    n = np.arange(n_fft)
    f = np.arange(n_fft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(f, n) / n_fft  # (n_freq, n_fft)
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    A = (np.cos(ang) * w / n_fft).astype(dtype)
    B = (-np.sin(ang) * w / n_fft).astype(dtype)
    return A, B


def _mm(x, m, dtype=None):
    """x @ m with float32 accumulation on the MXU.

    With dtype=bfloat16 the operands stream through the MXU at bf16 rate
    (several times the f32-pass rate on current TPUs) while partial sums
    stay f32 — the standard mixed-precision matmul contract.

    For f32 operands the precision is pinned to HIGHEST: on TPU, JAX's
    DEFAULT precision silently demotes f32 matmul operands to single-pass
    bf16, which would make "dft" the low-quality path on exactly the
    hardware it targets (CPU tests would never see it). HIGHEST keeps
    full f32 mantissas via multi-pass MXU accumulation.
    """
    if dtype is not None:
        x = x.astype(dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(x, jnp.asarray(m), (((x.ndim - 1,), (0,)),
                                                   ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _mm3x(x, m):
    """x @ m at Precision.HIGH: 3-pass bf16 MXU accumulation, ~f32-quality
    (relative error ~1e-7 on unit-scale data) at roughly half the cost of
    HIGHEST. The Griffin-Lim sweet spot on TPU."""
    return jax.lax.dot_general(x, jnp.asarray(m), (((x.ndim - 1,), (0,)),
                                                   ((), ())),
                               precision=jax.lax.Precision.HIGH,
                               preferred_element_type=jnp.float32)


def _dft_variant(method: str):
    """-> (operand dtype or None, matmul fn) for a dft-family method."""
    if method.endswith("bf16"):
        return jnp.bfloat16, _mm
    if method.endswith("3x"):
        return None, _mm3x
    return None, _mm


# ---------------------------------------------------------------------------
# Cooley–Tukey factored DFT ("ct"): N = 128 * N2 split so the big stage is a
# (128, 128) MXU matmul and the small N2-point stage is a VPU multiply-reduce.
# Cuts the per-frame MXU FLOPs ~(N/256)x vs. the full (N, N/2+1) DFT matmul
# (8x at n_fft=2048) while keeping ~f32 quality (Precision.HIGH matmuls).

_CT_N1 = 128  # MXU-stage size: one full systolic-array contraction


@functools.lru_cache(maxsize=8)
def _ct_mats(n_fft: int):
    """Constants for the factored transform. Requires n_fft % 256 == 0
    (N2 = n_fft/128 must be even so rfft bins split into N2/2 full blocks
    of 128 plus the Nyquist bin). All tiny: < 1 MB total at n_fft=2048."""
    if n_fft % (2 * _CT_N1) != 0:
        raise ValueError(
            f"stft method 'ct' needs n_fft % {2 * _CT_N1} == 0, got {n_fft}")
    N1, N2 = _CT_N1, n_fft // _CT_N1
    B2 = N2 // 2  # full 128-wide rfft blocks; bin n_fft//2 handled separately

    n1 = np.arange(N1)
    # stage 1 (forward): 128-point DFT over n1, per n2 stream
    ang1 = 2.0 * np.pi * np.outer(n1, n1) / N1
    C1 = np.cos(ang1).astype(np.float32)
    S1 = (-np.sin(ang1)).astype(np.float32)
    # stage 2 (forward): twiddle + N2-point DFT folded into one kernel:
    # E2[b, n2, k1] = exp(-2πi * n2 * (k1 + 128 b) / N)
    n2 = np.arange(N2)[None, :, None]
    k = (np.arange(N1)[None, None, :]
         + N1 * np.arange(B2)[:, None, None]).astype(np.float64)
    ang2 = 2.0 * np.pi * n2 * k / n_fft
    E2c = np.cos(ang2).astype(np.float32)
    E2s = (-np.sin(ang2)).astype(np.float32)
    alt = ((-1.0) ** np.arange(N2)).astype(np.float32)  # Nyquist column

    # inverse stage A: G[n2, k2, k1] = exp(+2πi * n2 * (k1 + 128 k2) / N)
    n2i = np.arange(N2)[:, None, None]
    ki = (np.arange(N1)[None, None, :]
          + N1 * np.arange(N2)[None, :, None]).astype(np.float64)
    angG = 2.0 * np.pi * n2i * ki / n_fft
    Gc = np.cos(angG).astype(np.float32)
    Gs = np.sin(angG).astype(np.float32)
    # inverse stage B: 128-point inverse DFT over k1 (1/N folded in)
    Cb = (np.cos(ang1) / n_fft).astype(np.float32)
    Sb = (np.sin(ang1) / n_fft).astype(np.float32)
    return {"C1": C1, "S1": S1, "E2c": E2c, "E2s": E2s, "alt": alt,
            "Gc": Gc, "Gs": Gs, "Cb": Cb, "Sb": Sb}


def _ct_rdft(frames: jax.Array, n_fft: int, m: dict) -> jax.Array:
    """(.., F, n_fft) real -> (.., F, n_freq) complex via 128 x N2 split."""
    N1, N2 = _CT_N1, n_fft // _CT_N1
    x = frames.reshape(frames.shape[:-1] + (N1, N2))   # [n1, n2]
    x = jnp.swapaxes(x, -1, -2)                        # [n2, n1]
    Yr = _mm3x(x, m["C1"])                             # (.., N2, N1) [n2, k1]
    Yi = _mm3x(x, m["S1"])
    # stage 2: per-block multiply-reduce over n2 (VPU; fuses, no matmul)
    E2c, E2s = jnp.asarray(m["E2c"]), jnp.asarray(m["E2s"])
    Xr = jnp.sum(Yr[..., None, :, :] * E2c - Yi[..., None, :, :] * E2s,
                 axis=-2)                              # (.., B2, N1)
    Xi = jnp.sum(Yr[..., None, :, :] * E2s + Yi[..., None, :, :] * E2c,
                 axis=-2)
    Xr = Xr.reshape(Xr.shape[:-2] + (n_fft // 2,))
    Xi = Xi.reshape(Xi.shape[:-2] + (n_fft // 2,))
    alt = jnp.asarray(m["alt"])
    nyq_r = jnp.sum(Yr[..., 0] * alt, axis=-1, keepdims=True)
    nyq_i = jnp.sum(Yi[..., 0] * alt, axis=-1, keepdims=True)
    return jax.lax.complex(jnp.concatenate([Xr, nyq_r], axis=-1),
                           jnp.concatenate([Xi, nyq_i], axis=-1))


def _ct_irdft(X: jax.Array, n_fft: int, m: dict) -> jax.Array:
    """(.., F, n_freq) complex -> (.., F, n_fft) real, factored inverse."""
    N1, N2 = _CT_N1, n_fft // _CT_N1
    Xr, Xi = jnp.real(X), jnp.imag(X)
    # full spectrum by conjugate symmetry: X[N-k] = conj(X[k])
    tail_r = jnp.flip(Xr[..., 1:-1], axis=-1)
    tail_i = -jnp.flip(Xi[..., 1:-1], axis=-1)
    Xr = jnp.concatenate([Xr, tail_r], axis=-1)        # (.., N)
    Xi = jnp.concatenate([Xi, tail_i], axis=-1)
    Xr = Xr.reshape(Xr.shape[:-1] + (N2, N1))          # [k2, k1]
    Xi = Xi.reshape(Xi.shape[:-1] + (N2, N1))
    Gc, Gs = jnp.asarray(m["Gc"]), jnp.asarray(m["Gs"])
    # stage A: twiddled N2-point inverse DFT over k2 (VPU multiply-reduce)
    Zr = jnp.sum(Xr[..., None, :, :] * Gc - Xi[..., None, :, :] * Gs,
                 axis=-2)                              # (.., N2, N1) [n2, k1]
    Zi = jnp.sum(Xr[..., None, :, :] * Gs + Xi[..., None, :, :] * Gc,
                 axis=-2)
    # stage B: 128-point inverse DFT over k1 on the MXU (real part only)
    x = _mm3x(Zr, m["Cb"]) - _mm3x(Zi, m["Sb"])        # (.., N2, N1) [n2, n1]
    x = jnp.swapaxes(x, -1, -2)                        # [n1, n2]
    return x.reshape(x.shape[:-2] + (n_fft,))


def dft_consts(n_fft: int, method: str) -> dict:
    """DFT matmul constants for `method` as a pytree (empty for "fft").

    Pass this through YOUR OWN jit boundary and hand it to
    stft/istft/griffin_lim via ``mats=`` so the matrices become runtime
    parameters of the compiled program. Left implicit (``mats=None``), the
    same matrices are embedded as HLO literals — measured on a v5e via the
    axon tunnel, that raises the Griffin-Lim compile from ~3 s to minutes
    (33 MB of literals shipped and folded per compile) and adds seconds to
    the first execution.
    """
    if method == "fft":
        return {}
    if method == "dft_pallas2":
        # the whole-loop fused kernel carries its own tiny factored-DFT
        # consts (griffin_lim.gl_consts adds them under "fused2"); no full
        # DFT matrices are needed at all
        return {}
    if method == "ct":
        return dict(_ct_mats(n_fft))
    if method in ("dft_mixed", "dft_pallas"):
        # both precisions: bf16 matrices for the cheap early rounds,
        # f32 matrices for the error-corrected finish + synthesis iSTFT.
        # (dft_pallas additionally needs the F-dependent fused-round
        # consts — griffin_lim.gl_consts adds them under "fused".)
        C, S = _dft_mats(n_fft, "float32")
        A, B = _idft_mats(n_fft, "float32")
        Cb, Sb = _dft_mats(n_fft, "bfloat16")
        Ab, Bb = _idft_mats(n_fft, "bfloat16")
        return {"C": C, "S": S, "A": A, "B": B,
                "Cb": Cb, "Sb": Sb, "Ab": Ab, "Bb": Bb}
    bf = method.endswith("bf16")
    dt = "bfloat16" if bf else "float32"
    C, S = _dft_mats(n_fft, dt)
    A, B = _idft_mats(n_fft, dt)
    d = {"C": C, "S": S, "A": A, "B": B}
    if bf:
        # the final synthesis iSTFT always runs full precision
        d["A32"], d["B32"] = _idft_mats(n_fft, "float32")
    return d


def rdft(frames: jax.Array, n_fft: int, method: str = "fft",
         mats: dict | None = None) -> jax.Array:
    """(.., F, n_fft) real -> (.., F, n_freq) complex64.

    method: "fft" (XLA FFT), "dft" (full-f32 MXU matmuls), "dft_3x"
    (3-pass bf16 accumulation, ~f32 quality, ~2x faster), "ct"
    (Cooley-Tukey factored — ~8x fewer matmul FLOPs at n_fft=2048, ~f32
    quality), or "dft_bf16" (single-pass bf16 operands — bounded quality
    loss; see tests/test_dsp.py). mats: see ``dft_consts``.
    """
    if method == "fft":
        return jnp.fft.rfft(frames, axis=-1)
    if method == "ct":
        return _ct_rdft(frames, n_fft, mats if mats is not None
                        else _ct_mats(n_fft))
    dt, mm = _dft_variant(method)
    if mats is not None:
        C, S = mats["C"], mats["S"]
    else:
        C, S = _dft_mats(n_fft, "bfloat16" if dt is not None else "float32")
    if dt is not None:
        return jax.lax.complex(mm(frames, C, dt), mm(frames, S, dt))
    return jax.lax.complex(mm(frames, C), mm(frames, S))


def irdft(X: jax.Array, n_fft: int, method: str = "fft",
          mats: dict | None = None) -> jax.Array:
    """(.., F, n_freq) complex -> (.., F, n_fft) real."""
    if method == "fft":
        return jnp.fft.irfft(X, n=n_fft, axis=-1)
    if method == "ct":
        return _ct_irdft(X, n_fft, mats if mats is not None
                         else _ct_mats(n_fft))
    dt, mm = _dft_variant(method)
    if mats is not None:
        A, B = mats["A"], mats["B"]
    else:
        A, B = _idft_mats(n_fft, "bfloat16" if dt is not None else "float32")
    if dt is not None:
        return mm(jnp.real(X), A, dt) + mm(jnp.imag(X), B, dt)
    return mm(jnp.real(X), A) + mm(jnp.imag(X), B)


# ---------------------------------------------------------------------------
# staggered-stream framing / overlap-add (no gather, no scatter)


def _frame_signal(y: jax.Array, n_frames: int, n_fft: int, hop: int
                  ) -> jax.Array:
    """y (..., L) already center-padded -> (..., n_frames, n_fft).

    Views y as hop-sized segments; frame f = segments[f : f+P] flattened,
    truncated to n_fft. P static slices + stack — no gather.
    """
    P = -(-n_fft // hop)  # ceil
    need = (n_frames - 1 + P) * hop
    L = y.shape[-1]
    if need > L:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, need - L)])
    else:
        y = y[..., :need]
    segs = y.reshape(y.shape[:-1] + (n_frames - 1 + P, hop))
    streams = [jax.lax.slice_in_dim(segs, j, j + n_frames, axis=-2)
               for j in range(P)]
    frames = jnp.concatenate(streams, axis=-1)  # (..., F, P*hop)
    return frames[..., :n_fft]


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """frames (..., F, n_fft) -> (..., n_fft + hop*(F-1)) by OLA.

    Transpose of ``_frame_signal``: pad frames to P*hop, view as (F, P, hop)
    stagger contributions, and sum P shifted streams. No scatter.
    """
    *batch, F, n_fft = frames.shape
    P = -(-n_fft // hop)
    frames = jnp.pad(frames,
                     [(0, 0)] * (len(batch) + 1) + [(0, P * hop - n_fft)])
    c = frames.reshape(*batch, F, P, hop)
    total_segs = F + P - 1
    out = jnp.zeros((*batch, total_segs, hop), frames.dtype)
    for j in range(P):
        # stream j: contribution of frame f lands in output segment f + j
        out = out.at[..., j: j + F, :].add(c[..., :, j, :])
    y = out.reshape(*batch, total_segs * hop)
    return y[..., : n_fft + hop * (F - 1)]


@functools.lru_cache(maxsize=8)
def _ola_window_sq(n_frames: int, n_fft: int, hop: int,
                   win_length: int) -> np.ndarray:
    """Summed squared window (NOLA denominator), precomputed on host."""
    win = hann_window(win_length, n_fft).astype(np.float64)
    total = n_fft + hop * (n_frames - 1)
    wsq = np.zeros(total)
    for f in range(n_frames):
        wsq[f * hop: f * hop + n_fft] += win * win
    wsq[wsq <= 1e-11] = 1.0
    return (1.0 / wsq).astype(np.float32)


# ---------------------------------------------------------------------------
# public API


def stft(y: jax.Array, n_fft: int, hop: int, win_length: int,
         method: str = "fft", mats: dict | None = None) -> jax.Array:
    """Centered STFT. y: (..., n) -> complex64 (..., 1 + n//hop, n_freq).

    Matches the reference's librosa call (utils.py:41-44): reflect-pad by
    n_fft//2, frame at `hop`, multiply by the centered Hann, real DFT.
    """
    pad = n_fft // 2
    n = y.shape[-1]
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    f = num_frames(n, n_fft, hop)
    frames = _frame_signal(y, f, n_fft, hop)
    win = jnp.asarray(hann_window(win_length, n_fft))
    return rdft(frames * win, n_fft, method, mats)


def istft(S: jax.Array, n_fft: int, hop: int, win_length: int,
          length: int | None = None, method: str = "fft",
          mats: dict | None = None) -> jax.Array:
    """Inverse STFT with NOLA window-sum normalization.

    S: (..., n_frames, n_freq) complex -> (..., n_samples) float32.
    Matches librosa.istft semantics (reference utils.py:109-114): windowed
    inverse DFT frames, overlap-add, divide by the summed squared window,
    trim the centering pad of n_fft//2 from both ends.
    """
    f = S.shape[-2]
    frames = irdft(S, n_fft, method, mats)
    win = jnp.asarray(hann_window(win_length, n_fft))
    y = _overlap_add(frames * win, hop)
    y = y * jnp.asarray(_ola_window_sq(f, n_fft, hop, win_length))
    pad = n_fft // 2
    total = n_fft + hop * (f - 1)
    y = y[..., pad: total - pad]
    if length is not None:
        y = y[..., :length]
    return y
