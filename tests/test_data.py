import os

import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.data.dataset import (Example, TrainLoader, parse_transcript,
                                     prepro_corpus, load_dataset_index)
from dc_tts_tpu.dsp.audio import save_wav


CFG = test_config()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """A tiny synthetic LJ-style corpus with real wav files."""
    root = tmp_path_factory.mktemp("corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        name = f"utt{i:03d}"
        n = CFG.hop_length * (20 + 4 * i)
        y = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / CFG.sr)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        save_wav(str(wavs / f"{name}.wav"), y, CFG.sr)
        lines.append(f"{name}|raw text {i}|a sentence number {i}.")
    (root / "transcript.csv").write_text("\n".join(lines))
    return str(root)


def test_parse_transcript_lj(corpus):
    ex = parse_transcript(CFG, corpus)
    assert len(ex) == 6
    assert ex[0].fpath.endswith("wavs/utt000.wav")
    assert ex[0].text_ids[-1] == 1  # EOS


def test_parse_transcript_five_field(tmp_path):
    lines = ["a.wav|x|hello there|1|3.5", "b.wav|x|too long|1|11.0"]
    (tmp_path / "transcript.csv").write_text("\n".join(lines))
    ex = parse_transcript(CFG, str(tmp_path))
    assert len(ex) == 1  # >10s clip dropped
    assert ex[0].fname == "a.wav"


def test_prepro_and_loader_roundtrip(corpus, tmp_path):
    out = str(tmp_path / "features")
    n = prepro_corpus(CFG, out, corpus, progress=False)
    assert n == 6
    mels = sorted(os.listdir(os.path.join(out, "mels")))
    assert len(mels) == 6
    mel = np.load(os.path.join(out, "mels", mels[0]))
    mag = np.load(os.path.join(out, "mags", mels[0]))
    assert mel.shape[1] == CFG.n_mels
    assert mag.shape[1] == CFG.n_freq
    assert mag.shape[0] == mel.shape[0] * CFG.r  # r-factor coupling

    examples = load_dataset_index(CFG, out, corpus)
    assert len(examples) == 6
    loader = TrainLoader(CFG, examples, out, batch_size=2, num_threads=2,
                         seed=1)
    batches = list(loader.batches(4))
    loader.stop()
    assert len(batches) == 4
    b = batches[0]
    assert b["texts"].shape == (2, CFG.max_N)
    assert b["mels"].shape == (2, CFG.max_T, CFG.n_mels)
    assert b["mags"].shape == (2, CFG.max_T * CFG.r, CFG.n_freq)
    assert (b["mel_lens"] > 0).all()
    assert (b["text_lens"] > 0).all()
    # padding beyond mel_lens must be zero
    i = 0
    t = int(b["mel_lens"][i])
    if t < CFG.max_T:
        assert np.abs(b["mels"][i, t:]).sum() == 0


def test_loader_infinite_stream(corpus, tmp_path):
    out = str(tmp_path / "f2")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    loader = TrainLoader(CFG, examples, out, batch_size=3, num_threads=2)
    it = iter(loader)
    seen = [next(it) for _ in range(5)]  # > num_batches -> wraps epochs
    loader.stop()
    assert len(seen) == 5


# ---------------------------------------------------------------- native IO

def test_native_wav_decode_matches_scipy(corpus):
    from dc_tts_tpu.data import native
    if not native.available():
        pytest.skip("libdcio.so not built")
    import glob
    from scipy.io import wavfile
    path = sorted(glob.glob(os.path.join(corpus, "wavs", "*.wav")))[0]
    y_native, sr = native.read_wav(path)
    sr2, y_scipy = wavfile.read(path)
    assert sr == sr2
    np.testing.assert_allclose(y_native, y_scipy.astype(np.float32),
                               atol=1e-6)


def test_native_loader_matches_python_loader(corpus, tmp_path):
    from dc_tts_tpu.data import native
    if not native.available():
        pytest.skip("libdcio.so not built")
    out = str(tmp_path / "nf")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    loader = native.NativeTrainLoader(CFG, examples, out, batch_size=2,
                                      num_threads=2, seed=0)
    batches = list(loader.batches(3))
    loader.stop()
    assert len(batches) == 3
    b = batches[0]
    assert b["texts"].shape == (2, CFG.max_N)
    assert b["mels"].shape == (2, CFG.max_T, CFG.n_mels)
    assert b["mags"].shape == (2, CFG.max_T * CFG.r, CFG.n_freq)
    assert b["texts"].dtype == np.int32
    assert (b["mel_lens"] > 0).all() and (b["text_lens"] > 0).all()
    # every example's padded region must be zero
    for i in range(2):
        t = int(b["mel_lens"][i])
        if t < CFG.max_T:
            assert np.abs(b["mels"][i, t:]).sum() == 0
        n = int(b["text_lens"][i])
        assert (b["texts"][i, n:] == 0).all()
    # content parity: native batches draw from the same files the python
    # loader uses; spot-check one known example appears with correct values
    ids_set = {tuple(e.text_ids) for e in examples}
    row = tuple(b["texts"][0][: int(b["text_lens"][0])])
    assert row in ids_set


# ------------------------------------------------------------ on-the-fly

def test_numpy_features_match_jax_path(corpus):
    import glob
    import jax.numpy as jnp
    from dc_tts_tpu.dsp.audio import load_wav
    from dc_tts_tpu.dsp.features import wav_to_spectrograms
    from dc_tts_tpu.dsp.features_np import wav_to_spectrograms_np
    path = sorted(glob.glob(os.path.join(corpus, "wavs", "*.wav")))[0]
    y = load_wav(path, CFG.sr)
    mel_j, mag_j = wav_to_spectrograms(jnp.asarray(y), CFG)
    mel_n, mag_n = wav_to_spectrograms_np(y, CFG)
    np.testing.assert_allclose(mel_n, np.asarray(mel_j), atol=2e-4)
    np.testing.assert_allclose(mag_n, np.asarray(mag_j), atol=2e-4)


def test_on_the_fly_loader_matches_precomputed(corpus, tmp_path):
    out = str(tmp_path / "f3")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    # same shuffle seed -> identical batch composition
    l1 = TrainLoader(CFG, examples, out, batch_size=2, num_threads=1, seed=7)
    l2 = TrainLoader(CFG, examples, out, batch_size=2, num_threads=1, seed=7,
                     on_the_fly=True)
    b1 = next(iter(l1)); l1.stop()
    b2 = next(iter(l2)); l2.stop()
    np.testing.assert_array_equal(b1["texts"], b2["texts"])
    np.testing.assert_allclose(b1["mels"], b2["mels"], atol=2e-4)
    np.testing.assert_allclose(b1["mags"], b2["mags"], atol=2e-4)


def test_loader_worker_crash_surfaces(corpus, tmp_path):
    """A worker hitting bad features must raise, not deadlock the consumer."""
    out = str(tmp_path / "bad")
    os.makedirs(os.path.join(out, "mels"))
    os.makedirs(os.path.join(out, "mags"))
    examples = parse_transcript(CFG, corpus)
    # features exist but have the wrong width -> assemble raises in worker
    for e in examples:
        base = e.fname.replace(".wav", ".npy")
        np.save(os.path.join(out, "mels", base),
                np.zeros((10, CFG.n_mels + 3), np.float32))
        np.save(os.path.join(out, "mags", base),
                np.zeros((40, CFG.n_freq), np.float32))
    loader = TrainLoader(CFG, examples, out, batch_size=2, num_threads=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(loader))
    loader.stop()


def test_bucketed_loader_shapes_and_coverage(corpus, tmp_path):
    """Length buckets (reference data_load.py:122-129 semantics, static
    shapes): every batch matches one declared bucket shape, every example
    fits its bucket, and a train step runs at each shape."""
    import jax
    from dc_tts_tpu.data.dataset import compute_bucket_shapes, npy_shape
    from dc_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from dc_tts_tpu.train.steps import (init_text2mel_state,
                                        make_text2mel_step)

    out = str(tmp_path / "features")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    buckets = compute_bucket_shapes(CFG, examples, out, n_buckets=2)
    assert buckets[-1] == (CFG.max_N, CFG.max_T)
    assert len(buckets) >= 2
    assert buckets[0][1] < CFG.max_T  # the small bucket really is smaller

    loader = TrainLoader(CFG, examples, out, batch_size=1, num_threads=2,
                         seed=3, buckets=buckets)
    assert loader.num_batches == len(examples)  # B=1: one batch/example
    seen = set()
    batches = list(loader.batches(2 * len(examples)))
    loader.stop()
    for b in batches:
        shape = (b["texts"].shape[1], b["mels"].shape[1])
        assert shape in [tuple(x) for x in buckets], shape
        seen.add(shape)
        # examples must FIT their bucket: no truncated mel unless at max_T
        t = int(b["mel_lens"][0])
        assert t <= shape[1]
        assert b["mags"].shape[1] == shape[1] * CFG.r
    assert len(seen) >= 2  # both shapes actually produced

    # a train step runs at each bucket shape (losses are length-masked)
    state = init_text2mel_state(CFG, jax.random.PRNGKey(0))
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    step = jax.jit(make_text2mel_step(CFG))
    with mesh:
        for shape in sorted(seen):
            b = next(x for x in batches
                     if (x["texts"].shape[1], x["mels"].shape[1]) == shape)
            state, metrics = step(state, shard_batch(b, mesh),
                                  jax.random.PRNGKey(1))
            assert np.isfinite(float(metrics["loss"]))


def test_bucket_assignment_never_truncates(corpus, tmp_path):
    """An example whose mel exceeds a small bucket must be routed to a
    bigger one (not clipped into the small bucket)."""
    from dc_tts_tpu.data.dataset import compute_bucket_shapes, npy_shape

    out = str(tmp_path / "features")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    buckets = compute_bucket_shapes(CFG, examples, out, n_buckets=3)
    loader = TrainLoader(CFG, examples, out, batch_size=1, buckets=buckets)
    for (n_b, t_b), group in zip(loader.buckets, loader._bucket_examples):
        for ex in group:
            base = ex.fname.replace(".wav", ".npy")
            t = npy_shape(os.path.join(out, "mels", base))[0]
            assert min(t, CFG.max_T) <= t_b
            assert min(len(ex.text_ids), CFG.max_N) <= n_b
    assert sum(len(g) for g in loader._bucket_examples) == len(examples)


@pytest.mark.slow
def test_bucketed_training_matches_full_grid_trajectory(corpus, tmp_path):
    """Buckets are the training default (BASELINE.md shows +27-60% steps/s);
    this pins that they do not change WHAT is learned: training on the same
    tiny corpus with bucketed shapes vs the full static grid reaches the
    same masked-L1 floor. (Unmasked mean-losses normalize over different
    padded areas by construction — the reference's dynamic bucket padding
    has the identical property, data_load.py:122-129 + train.py:85.)"""
    import jax
    from dc_tts_tpu.data.dataset import compute_bucket_shapes
    from dc_tts_tpu.train.steps import (init_text2mel_state,
                                        make_text2mel_step)

    out = str(tmp_path / "features")
    prepro_corpus(CFG, out, corpus, progress=False)
    examples = load_dataset_index(CFG, out, corpus)
    cfg = CFG.replace(warmup_steps=50.0)
    step = jax.jit(make_text2mel_step(cfg))

    def masked_l1(state, batch):
        from dc_tts_tpu.models.text2mel import Text2Mel
        from dc_tts_tpu.train.steps import teacher_forcing_shift
        import jax.numpy as jnp
        S = teacher_forcing_shift(jnp.asarray(batch["mels"]))
        _, Y, _, _ = Text2Mel(cfg).apply(state.params,
                                         jnp.asarray(batch["texts"]), S)
        t_mask = (np.arange(batch["mels"].shape[1])[None, :]
                  < batch["mel_lens"][:, None])[..., None]
        diff = np.abs(np.asarray(Y) - batch["mels"]) * t_mask
        return diff.sum() / (t_mask.sum() * cfg.n_mels)

    def train(buckets):
        loader = TrainLoader(cfg, examples, out, batch_size=2,
                             num_threads=2, seed=5, buckets=buckets)
        state = init_text2mel_state(cfg, jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(2)
        last = None
        for i, b in enumerate(loader.batches(150)):
            state, m = step(state, b, rng)
            last = b
        loader.stop()
        return masked_l1(state, last)

    buckets = compute_bucket_shapes(cfg, examples, out, n_buckets=2)
    l1_bucketed = train(buckets)
    l1_full = train(None)
    assert np.isfinite(l1_bucketed) and np.isfinite(l1_full)
    # same corpus, same step count: floors agree within a small band
    assert abs(l1_bucketed - l1_full) < 0.02, (l1_bucketed, l1_full)


def test_on_the_fly_buckets_no_prepro(corpus, tmp_path):
    """--on-the-fly composes with buckets: shapes come from wav headers
    (no feature files exist at all), every batch matches a declared bucket
    shape, and no example's mel is truncated by its bucket grid
    (wav-header lengths are upper bounds — trim only shortens)."""
    from dc_tts_tpu.data.dataset import compute_bucket_shapes, wav_mel_len

    examples = load_dataset_index(CFG, str(tmp_path / "nonexistent"),
                                  corpus, on_the_fly=True)
    assert len(examples) == 6  # all wavs usable, no npy required
    shapes = compute_bucket_shapes(CFG, examples, n_buckets=2,
                                   on_the_fly=True)
    assert shapes[-1] == (CFG.max_N, CFG.max_T)
    loader = TrainLoader(CFG, examples, batch_size=2, num_threads=1, seed=0,
                         on_the_fly=True, buckets=shapes)
    seen = set()
    it = iter(loader)
    for _ in range(loader.num_batches):
        b = next(it)
        shape = (b["texts"].shape[1], b["mels"].shape[1])
        assert shape in {tuple(s) for s in shapes}, shape
        # no truncation: actual lengths fit the bucket grid
        assert int(b["mel_lens"].max()) <= shape[1]
        assert int(b["text_lens"].max()) <= shape[0]
        seen.add(shape)
    loader.stop()
    assert len(seen) >= 1


def test_wav_mel_len_upper_bounds_actual(corpus):
    """The header estimate must never under-estimate the post-trim mel
    length (else bucket assignment could truncate content)."""
    from dc_tts_tpu.data.dataset import wav_mel_len
    from dc_tts_tpu.dsp.audio import load_wav
    from dc_tts_tpu.dsp.features_np import wav_to_spectrograms_np
    from dc_tts_tpu.dsp.features import reduce_mel

    for ex in parse_transcript(CFG, corpus):
        est = wav_mel_len(ex.fpath, CFG)
        y = load_wav(ex.fpath, CFG.sr)
        mel, mag = wav_to_spectrograms_np(y, CFG)
        mel, _ = reduce_mel(mel, mag, CFG.r)
        assert est >= mel.shape[0], (ex.fname, est, mel.shape)
