"""Chain LEARNING to the PRODUCTION synthesis path.

bench.py necessarily runs random weights (throughput is content-insensitive)
— so no driver-visible number would catch a perf knob silently degrading
real output (a wrong dft_mixed schedule constant, pcm16 clipping, a chunking
bug). This test closes that hole: train both nets to overfit one utterance
(the reference's by-ear validation loop, README.md:34-36), then synthesize
through the exact production configuration bench.py times — default
stft_method (dft_mixed), pcm16 device quantization, the chunked/overlapped
path with last-chunk padding — and pin the output against the training
target. Any knob that trades away real quality goes red here.

Reference anchor: /root/reference/synthesize.py:57-64 (synthesize + GL +
write wav per utterance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.dsp.features import reduce_mel, wav_to_spectrograms
from dc_tts_tpu.pipeline import Synthesizer
from dc_tts_tpu.train.steps import (init_ssrn_state, init_text2mel_state,
                                    make_ssrn_step, make_text2mel_step)
from dc_tts_tpu import text as text_mod


@pytest.mark.slow
def test_trained_nets_through_production_bench_path():
    cfg = test_config().replace(warmup_steps=200.0, B=1)
    assert cfg.stft_method == "dft_pallas2"  # the production/bench default

    sentence = "a quick brown fox."
    ids = text_mod.encode_batch([sentence], cfg)
    n_chars = int(np.flatnonzero(ids[0])[-1]) + 1

    # synthetic "speech": per-char tones so audio follows the text
    sr, hop = cfg.sr, cfg.hop_length
    samples_per_char = (cfg.max_T * cfg.r * hop) // n_chars
    wav = np.concatenate([
        0.4 * np.sin(2 * np.pi * (150 + 35 * (int(c) % 12))
                     * np.arange(samples_per_char) / sr)
        for c in ids[0, :n_chars]]).astype(np.float32)
    mel, mag = wav_to_spectrograms(jnp.asarray(wav), cfg)
    mel, mag = reduce_mel(np.asarray(mel), np.asarray(mag), cfg.r)
    t = min(mel.shape[0], cfg.max_T)
    mels = np.zeros((1, cfg.max_T, cfg.n_mels), np.float32)
    mags = np.zeros((1, cfg.max_T * cfg.r, cfg.n_freq), np.float32)
    mels[0, :t] = mel[:t]
    mags[0, : t * cfg.r] = mag[: t * cfg.r]

    batch = {"texts": jnp.asarray(ids), "mels": jnp.asarray(mels),
             "text_lens": jnp.asarray([n_chars]),
             "mel_lens": jnp.asarray([t])}
    sbatch = {"mels": jnp.asarray(mels), "mags": jnp.asarray(mags)}

    s1 = init_text2mel_state(cfg, jax.random.PRNGKey(0))
    s2 = init_ssrn_state(cfg, jax.random.PRNGKey(1))
    step1 = jax.jit(make_text2mel_step(cfg), donate_argnums=0)
    step2 = jax.jit(make_ssrn_step(cfg), donate_argnums=0)
    for _ in range(1500):
        s1, m1 = step1(s1, batch, jax.random.PRNGKey(2))
        s2, m2 = step2(s2, sbatch, jax.random.PRNGKey(3))
    assert float(m1["loss_mels"]) < 0.08, "t2m failed to overfit"
    assert float(m2["loss_mags"]) < 0.08, "ssrn failed to overfit"

    # EXACT bench configuration: pcm16 quantization on device, chunked
    # dispatch with a padded last chunk (chunk > batch exercises pad+slice)
    synth = Synthesizer(cfg, s1.params, s2.params, pcm16=True)
    wavs = synth.synthesize_ids_chunked(np.asarray(ids), chunk=2)
    assert wavs.dtype == np.int16 and wavs.shape[0] == 1
    out = wavs[0].astype(np.float32) / 32767.0
    assert np.isfinite(out).all() and np.abs(out).max() > 1e-3

    # pin real output quality: mel-spectral match of the synthesized audio
    # against the training target (the overfit-demo metric, through the
    # production path). Calibrated: corr ~0.8, L1 ~0.07 on this config —
    # a wrong GL schedule or quantization bug drops corr below ~0.4.
    mel_s, _ = wav_to_spectrograms(jnp.asarray(out), cfg)
    mel_s = np.asarray(reduce_mel(
        np.asarray(mel_s), np.zeros((mel_s.shape[0], cfg.n_freq),
                                    np.float32), cfg.r)[0])
    a = mels[0, :t].ravel()
    b = mel_s[:t].ravel()
    n = min(len(a), len(b))
    corr = float(np.corrcoef(a[:n], b[:n])[0, 1])
    l1 = float(np.abs(a[:n] - b[:n]).mean())
    assert corr > 0.6, f"mel correlation {corr:.3f}"
    assert l1 < 0.12, f"mel L1 {l1:.3f}"

    # and the f32 (non-pcm16) path delivers the SAME QUALITY — pcm16 must
    # be delivery, not a quality knob. (Sample-level comparison is not
    # meaningful here: the two deliveries are separate jit executables
    # whose last-bit differences the 50 GL phase-recovery rounds amplify
    # to ~1e-3 — deterministic per program, but not between programs. The
    # contract is that quantization costs no mel-spectral quality.)
    synth_f32 = Synthesizer(cfg, s1.params, s2.params, pcm16=False)
    w32, _, _, _ = synth_f32.synthesize_ids(jnp.asarray(ids))
    w32 = np.asarray(w32)[0]
    mel32, _ = wav_to_spectrograms(jnp.asarray(w32), cfg)
    mel32 = np.asarray(reduce_mel(
        np.asarray(mel32), np.zeros((mel32.shape[0], cfg.n_freq),
                                    np.float32), cfg.r)[0])
    b32 = mel32[:t].ravel()
    corr32 = float(np.corrcoef(a[:n], b32[:n])[0, 1])
    l1_32 = float(np.abs(a[:n] - b32[:n]).mean())
    assert abs(corr - corr32) < 0.02, (corr, corr32)
    assert abs(l1 - l1_32) < 0.01, (l1, l1_32)
