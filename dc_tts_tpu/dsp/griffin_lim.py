"""Device-resident Griffin-Lim vocoder.

The reference runs 50 host-CPU librosa STFT/iSTFT rounds per utterance,
serially (``/root/reference/utils.py:67-114``, driven from
``synthesize.py:60-64``). Here the whole loop is a ``lax.fori_loop`` over
batched on-device STFT/iSTFT, so a full batch of utterances is vocoded in one
jit call with no host round-trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Config
from .stft import stft, istft, dft_consts
from .features import deemphasis


def griffin_lim(mag: jax.Array, n_fft: int, hop: int, win_length: int,
                n_iter: int, method: str = "fft",
                mats: dict | None = None) -> jax.Array:
    """Phase reconstruction. mag: (..., T, n_freq) magnitude -> (..., samples).

    Iteration mirrors reference utils.py:96-107: X = mag * phase(stft(istft(X))),
    with the same 1e-8 magnitude floor, starting from zero phase.
    method="dft" routes the transforms through MXU matmuls (see dsp/stft.py)
    — the fast path on TPU. method="dft_bf16" additionally runs the phase-
    estimation rounds with bf16 operands (f32 accumulation) — an opt-in
    throughput knob: the magnitude is re-imposed every iteration so the
    error stays bounded, but the ~0.4%/transform phase noise raises the
    spectral-convergence floor ~2.5x vs f32 (see
    tests/test_dsp.py::test_griffin_lim_bf16_quality_bound). The final
    synthesis iSTFT always runs at full precision.

    mats: DFT matmul constants from ``dft_consts(n_fft, method)``. Pass
    them through your jit boundary as an argument; omitted, they become
    HLO literals, which compile minutes slower over the axon tunnel.
    """
    mag = mag.astype(jnp.float32)
    X = mag.astype(jnp.complex64)
    m = dft_consts(n_fft, method) if (mats is None and method != "fft") \
        else mats

    def round_fn(mth, mm):
        def body(_, X):
            x_t = istft(X, n_fft, hop, win_length, method=mth, mats=mm)
            est = stft(x_t, n_fft, hop, win_length, method=mth, mats=mm)
            phase = est / jnp.maximum(1e-8, jnp.abs(est))
            return mag * phase
        return body

    if method == "dft_pallas2":
        # The WHOLE loop as one Pallas kernel: per utterance, the spectrum,
        # waveform, frame buffer, and the tiny factored-DFT constants stay
        # VMEM-resident for all n_iter rounds — the magnitude is read once
        # and the waveform written once (ops/pallas_gl2.py). Measured
        # 0.201 s vs dft_pallas's 0.333 s for the full 50-iteration GL at
        # B=40 on v5e. Quality pinned equal to dft_mixed
        # (tests/test_pallas_gl2.py). Off-TPU runs in interpret mode.
        from ..ops.pallas_gl2 import (gl2_consts, gl2_geometry, gl2_run,
                                      scramble_mag)
        F = mag.shape[-2]
        lead = mag.shape[:-2]
        g = gl2_geometry(n_fft, hop, win_length, F)
        fused = m.get("fused2") if isinstance(m, dict) else None
        if (fused is None
                or fused.get("F_tag") is None
                or fused["F_tag"].shape[0] != F):
            # mismatched-F or missing consts: rebuild (under jit this
            # embeds literals — pass matching gl_consts through your jit
            # boundary to avoid slow compiles)
            fused = jax.tree.map(jnp.asarray,
                                 gl2_consts(n_fft, hop, win_length, F))
        interpret = jax.default_backend() != "tpu"
        mag_scr = scramble_mag(mag.reshape((-1, F, mag.shape[-1])), g)
        y = gl2_run(mag_scr, fused, g, n_iter, interpret=interpret)
        return y.reshape(lead + (-1,))

    if method == "dft_pallas":
        # dft_mixed's schedule with the bf16 middle rounds FUSED: two
        # Pallas kernels keep a whole istft->stft round's intermediates in
        # VMEM (ops/pallas_gl.py) — measured ~12.7 ms/round on XLA against
        # a ~3 ms MXU floor (scripts/gl_diag.py), all materialization gap.
        # Head/tail rounds and the final synthesis iSTFT stay on the exact
        # XLA 3-pass/f32 path, as in dft_mixed.
        from ..ops.pallas_gl import (fused_gl_round, gl_fused_consts,
                                     gl_geometry)
        F, n_freq = mag.shape[-2], mag.shape[-1]
        lead = mag.shape[:-2]
        g = gl_geometry(n_fft, hop, win_length, F)
        fused = m.get("fused") if isinstance(m, dict) else None
        # validate by frame count, not just the (fp1, hop) bucket: distinct
        # F can share fp1 while their NOLA tail normalization differs. The
        # F_tag is a zero-width (F, 0) array, so the check is static shape
        # inspection and works under jit tracing.
        if (fused is None
                or fused.get("F_tag") is None
                or fused["F_tag"].shape[0] != F
                or tuple(fused["wsq_seg"].shape) != (g.fp1, hop)):
            # caller passed no (or mismatched-F) fused consts; build here.
            # Under jit this embeds them as literals — pass matching mats
            # through your jit boundary (gl_consts) to avoid slow compiles.
            fused = jax.tree.map(jnp.asarray,
                                 gl_fused_consts(n_fft, hop, win_length, F))
        interpret = jax.default_backend() != "tpu"
        m3 = {"C": m["C"], "S": m["S"], "A": m["A"], "B": m["B"]}
        head = min(n_iter, max(1, n_iter // 10))
        tail = min(n_iter - head, max(2, n_iter // 10))
        mid = n_iter - head - tail

        mag3 = mag.reshape((-1, F, n_freq))
        pad_rows = ((0, 0), (0, g.f2 - F), (0, 0))
        mag_p = jnp.pad(mag3, pad_rows)

        def body(three):
            def b(_, c):
                return fused_gl_round(c[0], c[1], mag_p, fused, g,
                                      interpret, three_pass=three)
            return b

        # all three schedule phases run the fused kernels; head/tail use
        # the hi/lo 3-pass decomposition (≈ f32 basin selection, as
        # dft_mixed's dft_3x rounds), the middle single-pass bf16
        Xr = mag_p
        Xi = jnp.zeros_like(mag_p)
        Xr, Xi = jax.lax.fori_loop(0, head, body(True), (Xr, Xi))
        Xr, Xi = jax.lax.fori_loop(0, mid, body(False), (Xr, Xi))
        Xr, Xi = jax.lax.fori_loop(0, tail, body(True), (Xr, Xi))
        X = jax.lax.complex(Xr[:, :F], Xi[:, :F])

        y = istft(X, n_fft, hop, win_length, method="dft", mats=m3)
        return jnp.real(y).reshape(lead + (-1,))

    if method == "dft_mixed":
        # Mixed-precision schedule: GL is a non-convex fixed-point
        # iteration — the phase BASIN is selected in the first few
        # rounds, after which re-projection onto the true magnitude
        # keeps the iterate inside it. So the head rounds run 3-pass
        # f32 (basin selection is precision-sensitive: on a bistable
        # 2-tone probe, all-bf16 lands at 2.4x the f32 spectral-
        # convergence floor), the middle runs single-pass bf16 (cheap
        # polish inside the locked basin), and the tail re-runs 3-pass
        # to converge into the f32 fixed-point neighborhood. Output
        # quality matches the all-f32 schedule exactly on that probe
        # (tests/test_dsp.py::test_griffin_lim_mixed_matches_default_
        # quality) at ~47% of the all-3-pass FLOP cost.
        mb = {"C": m["Cb"], "S": m["Sb"], "A": m["Ab"], "B": m["Bb"]}
        m3 = {"C": m["C"], "S": m["S"], "A": m["A"], "B": m["B"]}
        head = min(n_iter, max(1, n_iter // 10))
        tail = min(n_iter - head, max(2, n_iter // 10))
        X = jax.lax.fori_loop(0, head, round_fn("dft_3x", m3), X)
        X = jax.lax.fori_loop(0, n_iter - head - tail,
                              round_fn("dft_bf16", mb), X)
        X = jax.lax.fori_loop(0, tail, round_fn("dft_3x", m3), X)
        y = istft(X, n_fft, hop, win_length, method="dft", mats=m3)
        return jnp.real(y)

    X = jax.lax.fori_loop(0, n_iter, round_fn(method, m), X)
    if method.endswith("bf16"):
        final_method = "dft"
        final_m = None if m is None else {"A": m["A32"], "B": m["B32"]}
    else:
        final_method, final_m = method, m
    y = istft(X, n_fft, hop, win_length, method=final_method, mats=final_m)
    return jnp.real(y)


@functools.lru_cache(maxsize=4)
def _gl_consts_cached(n_fft: int, method: str, hop: int, win_length: int,
                      F: int) -> dict:
    d = dict(dft_consts(n_fft, method))
    if method == "dft_pallas":
        from ..ops.pallas_gl import gl_fused_consts
        d["fused"] = gl_fused_consts(n_fft, hop, win_length, F)
    if method == "dft_pallas2":
        from ..ops.pallas_gl2 import gl2_consts
        d["fused2"] = gl2_consts(n_fft, hop, win_length, F)
    # Device-resident: numpy leaves would be RE-UPLOADED on every call of
    # any jit they feed — ~50-70 MB per synthesis chunk, ~1.4 s over the
    # axon tunnel (measured round 3: the profiler's GL stage read 1.81 s
    # while the device compute was 0.42 s). The lru_cache keeps them alive.
    import jax
    return jax.device_put(d)


def gl_consts(cfg: Config, F: int | None = None) -> dict:
    """Constants pytree for ``spectrogram_to_wav``'s jit boundary.

    For the fused-Pallas method the consts depend on the frame count; F
    defaults to the synthesis pipeline's static max_T * r grid."""
    return _gl_consts_cached(cfg.n_fft, cfg.stft_method, cfg.hop_length,
                             cfg.win_length, F or cfg.max_T * cfg.r)


def spectrogram_to_wav(mag_norm: jax.Array, cfg: Config,
                       mats: dict | None = None) -> jax.Array:
    """Normalized linear spectrogram (..., T, n_freq) in [0,1] -> waveform.

    Reproduces reference utils.py:67-92 end to end on device:
    denormalize dB -> amplitude -> sharpen by ``power`` -> Griffin-Lim ->
    first-order de-preemphasis IIR. (The reference's final
    ``librosa.effects.trim`` is host-side cosmetic trimming; see
    ``features.trim_silence`` for callers that want it.)

    mats: pass ``gl_consts(cfg)`` through your own jit boundary when
    embedding this in a larger jitted pipeline (see ``dft_consts``).
    Called eagerly (outside any jit) with mats=None, the constants are
    supplied automatically as runtime arguments — leaving them to be
    constant-folded as HLO literals costs MINUTES of compile over the
    axon tunnel (measured 18 min for "dft_mixed" at n_fft=2048).
    """
    if mats is None and not isinstance(mag_norm, jax.core.Tracer) \
            and cfg.stft_method != "fft":
        mats = gl_consts(cfg, F=mag_norm.shape[-2])
    return _spectrogram_to_wav_jit(mag_norm, cfg, mats)


def denormalize_mag(mag_norm: jax.Array, cfg: Config) -> jax.Array:
    """[0,1]-normalized spectrogram -> sharpened linear amplitude, exactly
    reference utils.py:80-86: clip -> dB denorm -> amplitude -> ^power.
    Shared by spectrogram_to_wav and the time-sharded vocoder
    (parallel/sp_gl.py) so the normalization contract cannot drift."""
    mag = jnp.clip(mag_norm, 0.0, 1.0) * cfg.max_db - cfg.max_db + cfg.ref_db
    mag = jnp.power(10.0, mag * 0.05)
    return mag ** cfg.power


@functools.partial(jax.jit, static_argnames=("cfg",))
def _spectrogram_to_wav_jit(mag_norm: jax.Array, cfg: Config,
                            mats: dict | None) -> jax.Array:
    wav = griffin_lim(denormalize_mag(mag_norm, cfg), cfg.n_fft,
                      cfg.hop_length, cfg.win_length, cfg.n_iter,
                      method=cfg.stft_method, mats=mats)
    wav = deemphasis(wav, cfg.preemphasis)
    return wav.astype(jnp.float32)
