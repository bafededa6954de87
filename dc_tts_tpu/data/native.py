"""ctypes bindings for the native data-IO runtime (native/dataio.cpp).

The C++ library plays the role TF's C++ queue runners play in the reference
(data_load.py:99-129): multithreaded feature reading and padded-batch
assembly off the Python GIL. Falls back cleanly when the shared library has
not been built (``make -C native``) — ``available()`` reports status and
``NativeTrainLoader`` raises a clear error.
"""
from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Sequence

import numpy as np

from ..config import Config
from .dataset import Example

_LIB = None


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native", "libdcio.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"native library not built: {path} (run `make -C native`)")
    lib = ctypes.CDLL(path)
    lib.dcio_wav_read.restype = ctypes.c_void_p
    lib.dcio_wav_read.argtypes = [ctypes.c_char_p]
    lib.dcio_wav_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.dcio_wav_data.argtypes = [ctypes.c_void_p]
    lib.dcio_wav_len.restype = ctypes.c_int64
    lib.dcio_wav_len.argtypes = [ctypes.c_void_p]
    lib.dcio_wav_sr.restype = ctypes.c_int32
    lib.dcio_wav_sr.argtypes = [ctypes.c_void_p]
    lib.dcio_wav_free.argtypes = [ctypes.c_void_p]
    lib.dcio_loader_create.restype = ctypes.c_void_p
    lib.dcio_loader_create.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64]
    lib.dcio_loader_next.restype = ctypes.c_int32
    lib.dcio_loader_next.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.dcio_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Decode a wav via the native reader -> (float32 mono, sample_rate)."""
    lib = _load()
    h = lib.dcio_wav_read(path.encode())
    if not h:
        raise IOError(f"native wav decode failed: {path}")
    try:
        n = lib.dcio_wav_len(h)
        sr = lib.dcio_wav_sr(h)
        buf = np.ctypeslib.as_array(lib.dcio_wav_data(h), shape=(n,))
        return buf.copy(), int(sr)
    finally:
        lib.dcio_wav_free(h)


class NativeTrainLoader:
    """Drop-in analogue of dataset.TrainLoader backed by the C++ prefetcher.

    Yields the same dict schema: texts, mels, mags, text_lens, mel_lens,
    all statically shaped.
    """

    def __init__(self, cfg: Config, examples: Sequence[Example],
                 feature_dir: str = ".", *, batch_size: Optional[int] = None,
                 num_threads: int = 8, queue_batches: int = 4,
                 seed: int = 0):
        self.cfg = cfg
        self.batch_size = batch_size or cfg.B
        lib = _load()
        examples = [e for e in examples if len(e.text_ids) <= cfg.max_N]
        if not examples:
            raise ValueError("no usable examples")
        self.num_batches = len(examples) // self.batch_size
        flat, offsets = [], [0]
        mel_paths, mag_paths = [], []
        for e in examples:
            flat.extend(int(i) for i in e.text_ids)
            offsets.append(len(flat))
            base = e.fname.replace(".wav", ".npy")
            mel_paths.append(os.path.join(feature_dir, "mels", base))
            mag_paths.append(os.path.join(feature_dir, "mags", base))
        texts = np.asarray(flat, np.int32)
        offs = np.asarray(offsets, np.int64)
        self._handle = lib.dcio_loader_create(
            len(examples),
            texts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            "\n".join(mel_paths).encode(), "\n".join(mag_paths).encode(),
            self.batch_size, cfg.max_N, cfg.max_T, cfg.n_mels, cfg.n_freq,
            cfg.r, num_threads, queue_batches, seed)
        if not self._handle:
            raise RuntimeError("dcio_loader_create failed")
        self._lib = lib

    def __iter__(self) -> Iterator[dict]:
        cfg = self.cfg
        B = self.batch_size
        while True:
            texts = np.empty((B, cfg.max_N), np.int32)
            mels = np.empty((B, cfg.max_T, cfg.n_mels), np.float32)
            mags = np.empty((B, cfg.max_T * cfg.r, cfg.n_freq), np.float32)
            text_lens = np.empty((B,), np.int32)
            mel_lens = np.empty((B,), np.int32)
            rc = self._lib.dcio_loader_next(
                self._handle,
                texts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                mels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mags.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                text_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                mel_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc != 0:
                return
            yield {"texts": texts, "mels": mels, "mags": mags,
                   "text_lens": text_lens, "mel_lens": mel_lens}

    def batches(self, n: int) -> Iterator[dict]:
        it = iter(self)
        for _ in range(n):
            yield next(it)

    def stop(self):
        if getattr(self, "_handle", None):
            self._lib.dcio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
