"""Offline feature extraction CLI: ``python -m dc_tts_tpu.prepro``.

Mirrors the reference's ``prepo.py``: walk the corpus, save
``mels/<name>.npy`` (T/r, n_mels) and ``mags/<name>.npy`` (T, n_freq).
"""
from __future__ import annotations

import argparse

from .config import base_config
from .data.dataset import prepro_corpus


def main(argv=None):
    ap = argparse.ArgumentParser(description="Precompute mel/mag features")
    ap.add_argument("--data", default=None, help="corpus dir")
    ap.add_argument("--out", default=".", help="output dir for mels/ mags/")
    ap.add_argument("--tiny", action="store_true",
                    help="use the tiny test config (CI smoke runs)")
    args = ap.parse_args(argv)
    from .config import test_config
    cfg = test_config() if args.tiny else base_config()
    n = prepro_corpus(cfg, args.out, args.data or cfg.data)
    print(f"preprocessed {n} utterances")


if __name__ == "__main__":
    main()
