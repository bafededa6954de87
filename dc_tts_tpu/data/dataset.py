"""Corpus parsing, offline preprocessing, and the training input pipeline.

Behavioral contract from the reference's data layer
(``/root/reference/data_load.py`` and ``prepo.py``):

* LJSpeech transcripts: ``fname|rawtext|normalized_text`` lines; wavs at
  ``<data>/wavs/<fname>.wav`` (data_load.py:42-58).
* Generic 5-field transcripts: ``fname|_|text|is_inside_quotes|duration``
  with clips > 10 s skipped (data_load.py:59-77).
* EOS "E" appended to every utterance.
* Offline prepro saves ``mels/<name>.npy`` (T/r, n_mels) and
  ``mags/<name>.npy`` (T, n_freq) (prepo.py:16-25).

The pipeline itself is rebuilt TPU-first. The reference uses TF1 queue
runners with dynamic bucket-padded shapes (data_load.py:88-131) — dynamic
shapes force XLA recompilation, so instead every batch is padded to the
static (max_N, max_T) grid with explicit per-example lengths (the losses
mask by length, reproducing the bucket semantics), and a background thread
pool prefetches + assembles batches so the accelerator never waits on host
I/O — the role TF's C++ queue runners played.
"""
from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..config import Config
from ..dsp.features import reduce_mel
from .. import text as text_mod


@dataclass
class Example:
    fname: str
    fpath: str
    text_ids: np.ndarray  # (n,) int32 incl EOS


def parse_transcript(cfg: Config, data_dir: Optional[str] = None
                     ) -> List[Example]:
    """Parse transcript.csv in either reference format."""
    data_dir = data_dir or cfg.data
    path = os.path.join(data_dir, "transcript.csv")
    # LJSpeech ships metadata.csv; accept either name.
    if not os.path.exists(path):
        alt = os.path.join(data_dir, "metadata.csv")
        if os.path.exists(alt):
            path = alt
    examples = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            fields = line.split("|")
            if len(fields) >= 5:  # nick/kate style with duration filter
                fname, _, text, _, duration = fields[:5]
                if float(duration) > 10.0:
                    continue
                fpath = os.path.join(data_dir, fname)
            else:  # LJ style
                fname, text = fields[0], fields[-1]
                fpath = os.path.join(data_dir, "wavs", fname + ".wav")
            ids = text_mod.encode_text(text, cfg)
            examples.append(Example(os.path.basename(fpath), fpath, ids))
    return examples


# ---------------------------------------------------------------------------
# offline preprocessing (the reference's prepo.py)


def prepro_corpus(cfg: Config, out_dir: str = ".",
                  data_dir: Optional[str] = None,
                  examples: Optional[Sequence[Example]] = None,
                  progress: bool = True) -> int:
    """Extract and save mels/<name>.npy + mags/<name>.npy for the corpus.

    Feature math runs through the device DSP path (dsp.features), the same
    code synthesis uses — one source of truth for the spectrogram contract.
    """
    import jax.numpy as jnp

    from ..dsp.audio import load_wav
    from ..dsp.features import reduce_mel, wav_to_spectrograms

    examples = examples if examples is not None else \
        parse_transcript(cfg, data_dir)
    mel_dir = os.path.join(out_dir, "mels")
    mag_dir = os.path.join(out_dir, "mags")
    os.makedirs(mel_dir, exist_ok=True)
    os.makedirs(mag_dir, exist_ok=True)
    n = 0
    for ex in examples:
        y = load_wav(ex.fpath, cfg.sr)
        mel, mag = wav_to_spectrograms(jnp.asarray(y), cfg)
        mel, mag = reduce_mel(np.asarray(mel), np.asarray(mag), cfg.r)
        base = ex.fname.replace(".wav", ".npy")
        np.save(os.path.join(mel_dir, base), mel.astype(np.float32))
        np.save(os.path.join(mag_dir, base), mag.astype(np.float32))
        n += 1
        if progress and n % 100 == 0:
            print(f"prepro: {n}/{len(examples)}")
    return n


# ---------------------------------------------------------------------------
# training loader


def load_dataset_index(cfg: Config, feature_dir: str = ".",
                       data_dir: Optional[str] = None) -> List[Example]:
    """Examples whose precomputed features exist and fit the static grid."""
    examples = parse_transcript(cfg, data_dir)
    out = []
    for ex in examples:
        base = ex.fname.replace(".wav", ".npy")
        mel_path = os.path.join(feature_dir, "mels", base)
        if not os.path.exists(mel_path):
            continue
        if len(ex.text_ids) > cfg.max_N:
            continue
        out.append(ex)
    return out


class TrainLoader:
    """Threaded, shuffled, statically-shaped batch loader.

    Produces dicts with keys texts (B, max_N) i32, mels (B, max_T, n_mels)
    f32, mags (B, max_T*r, n_freq) f32, text_lens (B,), mel_lens (B,).
    Examples whose features exceed the static grid are skipped at index
    time. `num_threads` workers read .npy files and a bounded queue holds
    assembled batches (capacity mirrors the reference's 4*B queue,
    data_load.py:128).
    """

    def __init__(self, cfg: Config, examples: Sequence[Example],
                 feature_dir: str = ".", *, batch_size: Optional[int] = None,
                 num_threads: int = 8, queue_batches: int = 4, seed: int = 0,
                 drop_overlong: bool = True, on_the_fly: bool = False):
        self.cfg = cfg
        self.feature_dir = feature_dir
        # on_the_fly mirrors the reference's prepro=False path
        # (data_load.py:104-113): workers decode wavs and compute
        # spectrograms (numpy) instead of reading .npy features.
        self.on_the_fly = on_the_fly
        self.batch_size = batch_size or cfg.B
        self.rng = np.random.default_rng(seed)
        self.examples = list(examples)
        if drop_overlong:
            self.examples = [e for e in self.examples
                             if len(e.text_ids) <= cfg.max_N]
        if not self.examples:
            raise ValueError("no usable examples")
        self.num_batches = len(self.examples) // self.batch_size
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_batches)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._work: "queue.Queue" = queue.Queue()
        self._num_threads = num_threads

    # -- example assembly ------------------------------------------------
    def _load_example(self, ex: Example):
        cfg = self.cfg
        if self.on_the_fly:
            from ..dsp.audio import load_wav
            from ..dsp.features_np import wav_to_spectrograms_np
            y = load_wav(ex.fpath, cfg.sr)
            mel, mag = wav_to_spectrograms_np(y, cfg)
            mel, mag = reduce_mel(mel, mag, cfg.r)
        else:
            base = ex.fname.replace(".wav", ".npy")
            mel = np.load(os.path.join(self.feature_dir, "mels", base))
            mag = np.load(os.path.join(self.feature_dir, "mags", base))
        t = min(mel.shape[0], cfg.max_T)
        return ex.text_ids, mel[:t], mag[: t * cfg.r], t

    def _assemble(self, batch_examples):
        cfg = self.cfg
        B = len(batch_examples)
        texts = np.zeros((B, cfg.max_N), np.int32)
        mels = np.zeros((B, cfg.max_T, cfg.n_mels), np.float32)
        mags = np.zeros((B, cfg.max_T * cfg.r, cfg.n_freq), np.float32)
        text_lens = np.zeros((B,), np.int32)
        mel_lens = np.zeros((B,), np.int32)
        for i, ex in enumerate(batch_examples):
            ids, mel, mag, t = self._load_example(ex)
            texts[i, : len(ids)] = ids[: cfg.max_N]
            mels[i, :t] = mel
            mags[i, : mag.shape[0]] = mag
            text_lens[i] = min(len(ids), cfg.max_N)
            mel_lens[i] = t
        return {"texts": texts, "mels": mels, "mags": mags,
                "text_lens": text_lens, "mel_lens": mel_lens}

    # -- iteration -------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        """Infinite epoch-shuffled stream (like slice_input_producer).
        A worker crash (unreadable/mismatched features) is re-raised here
        instead of deadlocking the consumer on an empty queue."""
        self.start()
        try:
            while True:
                try:
                    yield self._queue.get(timeout=1.0)
                except queue.Empty:
                    if self._error is not None:
                        raise RuntimeError(
                            "data loader worker failed") from self._error
                    if self._stop.is_set():
                        return
        finally:
            self.stop()

    def batches(self, n: int) -> Iterator[dict]:
        it = iter(self)
        for _ in range(n):
            yield next(it)

    # -- threading -------------------------------------------------------
    def start(self):
        if self._threads:
            return
        self._stop.clear()
        feeder = threading.Thread(target=self._feed, daemon=True)
        feeder.start()
        self._threads.append(feeder)
        for _ in range(self._num_threads):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=0.2)
        self._threads = []
        for q in (self._queue, self._work):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def _feed(self):
        while not self._stop.is_set():
            order = self.rng.permutation(len(self.examples))
            for i in range(self.num_batches):
                if self._stop.is_set():
                    return
                idx = order[i * self.batch_size: (i + 1) * self.batch_size]
                try:
                    self._work.put([self.examples[j] for j in idx],
                                   timeout=0.2)
                except queue.Full:
                    if self._stop.is_set():
                        return
                    continue

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch_examples = self._work.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                batch = self._assemble(batch_examples)
            except Exception as e:  # surface worker crashes to the consumer
                self._error = e
                self._stop.set()
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue
