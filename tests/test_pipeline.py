"""End-to-end pipeline tests on the tiny config."""
import jax
import numpy as np

from dc_tts_tpu.config import test_config
from dc_tts_tpu.pipeline import Synthesizer
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.train import checkpoint
from dc_tts_tpu.train.steps import init_text2mel_state, init_ssrn_state


CFG = test_config()
KEY = jax.random.PRNGKey(0)


def _synth():
    k1, k2 = jax.random.split(KEY)
    return Synthesizer(CFG, Text2Mel(CFG).init(k1), SSRN(CFG).init(k2))


def test_text_to_waveform_end_to_end():
    synth = _synth()
    wavs = synth.synthesize(["hello world.", "a second sentence."],
                            trim=False)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0
        assert np.isfinite(w).all()


def test_synthesize_ids_shapes():
    synth = _synth()
    ids = jax.random.randint(KEY, (3, CFG.max_N), 1, CFG.vocab_size)
    wav, Y, Z, align = synth.synthesize_ids(ids)
    assert Y.shape == (3, CFG.max_T, CFG.n_mels)
    assert Z.shape == (3, CFG.max_T * CFG.r, CFG.n_freq)
    assert align.shape == (3, CFG.max_N, CFG.max_T)
    assert wav.shape[0] == 3


def test_from_checkpoints_two_namespaces(tmp_path):
    """Full restore path: Text2Mel from logdir-1, SSRN from logdir-2."""
    t2m_state = init_text2mel_state(CFG, KEY)
    ssrn_state = init_ssrn_state(CFG, jax.random.PRNGKey(1))
    d1, d2 = str(tmp_path / "logdir-1"), str(tmp_path / "logdir-2")
    checkpoint.save(d1, t2m_state.params, 1000)
    checkpoint.save(d2, ssrn_state.params, 2000)
    synth = Synthesizer.from_checkpoints(CFG, d1, d2)
    wavs = synth.synthesize(["test."], trim=False)
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()


def test_decode_modes_both_run():
    k1, k2 = jax.random.split(KEY)
    for mode in ["incremental", "reference"]:
        synth = Synthesizer(CFG, Text2Mel(CFG).init(k1),
                            SSRN(CFG).init(k2), decode_mode=mode)
        wavs = synth.synthesize(["quick check."], trim=False)
        assert np.isfinite(wavs[0]).all()


def test_pipelined_synthesis_matches_plain():
    """PP over two 4-device submeshes == plain synthesis."""
    from dc_tts_tpu.pipeline import PipelinedSynthesizer
    k1, k2 = jax.random.split(KEY)
    t2m = Text2Mel(CFG).init(k1)
    ssrn = SSRN(CFG).init(k2)
    ids = jax.random.randint(jax.random.PRNGKey(3), (8, CFG.max_N), 1,
                             CFG.vocab_size)
    # both paths now run the fused decode kernel (the pipelined stages are
    # shard_mapped over their submeshes); pin PIPELINING equivalence
    # like-for-like against the plain fused-path Synthesizer
    plain = Synthesizer(CFG, t2m, ssrn)
    w_plain, _, _, _ = plain.synthesize_ids(ids)
    # 8 devices -> two 4-device submeshes; microbatch must divide by 4
    piped = PipelinedSynthesizer(CFG, t2m, ssrn, microbatch=4)
    w_piped = piped.synthesize_ids(np.asarray(ids))
    # 2e-3: the submesh SSRN's different f32 reduction order perturbs the
    # magnitudes at ~1e-6, and Griffin-Lim amplifies that at the NOLA
    # tail (window-sum division) to ~1e-3 on a few samples; same-input
    # GL equality is pinned exactly in test_pallas_gl2.py
    np.testing.assert_allclose(w_piped, np.asarray(w_plain), atol=2e-3)


def test_pipelined_rejects_bad_microbatch():
    """A microbatch not divisible by a stage submesh size must fail loudly
    at construction, not as an opaque sharding error inside jit."""
    import pytest
    from dc_tts_tpu.pipeline import PipelinedSynthesizer
    k1, k2 = jax.random.split(KEY)
    with pytest.raises(ValueError, match="microbatch"):
        PipelinedSynthesizer(CFG, Text2Mel(CFG).init(k1),
                             SSRN(CFG).init(k2), microbatch=6)


def test_pcm16_delivery_matches_float():
    """pcm16=True returns int16 waveforms that are the quantization of the
    float pipeline's output (same params, same ids)."""
    import jax
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.pipeline import Synthesizer

    cfg = test_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    p1, p2 = Text2Mel(cfg).init(k1), SSRN(cfg).init(k2)
    ids = np.zeros((2, cfg.max_N), np.int32)
    ids[:, :5] = [[3, 4, 5, 6, 1], [7, 8, 9, 10, 1]]

    wav_f, _, _, _ = Synthesizer(cfg, p1, p2).synthesize_ids(ids)
    wav_i, _, _, _ = Synthesizer(cfg, p1, p2, pcm16=True).synthesize_ids(ids)
    assert np.asarray(wav_i).dtype == np.int16
    expect = np.round(np.clip(np.asarray(wav_f), -1, 1) * 32767)
    np.testing.assert_allclose(np.asarray(wav_i), expect, atol=1)


def test_chunked_synthesis_matches_batched():
    """synthesize_ids_chunked (arbitrary batch, fixed-shape chunks with a
    padded tail) must equal per-row batched synthesis.

    Pinned under an all-f32 GL backend: the chunk/pad logic is what is
    under test, and f32 transforms are batch-shape-invariant to ~1e-5.
    The production default "dft_mixed" is NOT exactly batch-invariant
    (its bf16 middle rounds accumulate shape-dependent rounding that GL
    amplifies — measured rms ~3.5e-5, max ~1e-3 on [-1,1] waveforms,
    ≈ -89 dB, inaudible); a separate loose bound below documents that."""
    import jax
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.pipeline import Synthesizer

    cfg = test_config().replace(stft_method="dft_3x")
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    p1, p2 = Text2Mel(cfg).init(k1), SSRN(cfg).init(k2)
    ids = np.zeros((5, cfg.max_N), np.int32)
    for i in range(5):
        ids[i, : 4 + i] = (np.arange(4 + i) % 28) + 3

    synth = Synthesizer(cfg, p1, p2)
    want, _, _, _ = synth.synthesize_ids(ids)
    got = synth.synthesize_ids_chunked(ids, chunk=2)  # 3 chunks, tail padded
    assert got.shape == np.asarray(want).shape
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_chunked_synthesis_default_method_close():
    """Under the production default GL ("dft_pallas2"), chunked synthesis
    must stay within the documented inaudible envelope of the batched
    run (bf16 middle rounds are batch-shape-dependent; see above)."""
    import jax
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.pipeline import Synthesizer

    cfg = test_config()
    assert cfg.stft_method == "dft_pallas2"  # guards the default
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    p1, p2 = Text2Mel(cfg).init(k1), SSRN(cfg).init(k2)
    ids = np.zeros((5, cfg.max_N), np.int32)
    for i in range(5):
        ids[i, : 4 + i] = (np.arange(4 + i) % 28) + 3

    synth = Synthesizer(cfg, p1, p2)
    want = np.asarray(synth.synthesize_ids(ids)[0])
    got = np.asarray(synth.synthesize_ids_chunked(ids, chunk=2))
    d = got - want
    rms = float(np.sqrt((d ** 2).mean()))
    assert rms < 2e-4 and np.abs(d).max() < 5e-3, (rms, np.abs(d).max())


def test_decode_prec_option_runs():
    """Synthesizer(decode_prec=...) routes the fused kernel's reduced
    precision modes (opt-in for trained checkpoints); outputs stay within
    the documented envelope of the default at tiny geometry."""
    k1, k2 = jax.random.split(KEY)
    t2m = Text2Mel(CFG).init(k1)
    ssrn = SSRN(CFG).init(k2)
    ids = np.zeros((2, CFG.max_N), np.int32)
    ids[:, :5] = [[3, 4, 5, 6, 1], [7, 8, 9, 10, 1]]
    _, Y_hi, _, _ = Synthesizer(CFG, t2m, ssrn).synthesize_ids(ids)
    for prec in ("hybrid", "high3"):
        _, Y, _, _ = Synthesizer(CFG, t2m, ssrn,
                                 decode_prec=prec).synthesize_ids(ids)
        assert np.isfinite(np.asarray(Y)).all()
        np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_hi),
                                   atol=1e-3)
