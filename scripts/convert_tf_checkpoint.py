"""Convert a trained reference (TF1) checkpoint into this framework's format.

The reference publishes a pretrained LJSpeech checkpoint pair
(logdir-1 = Text2Mel, logdir-2 = SSRN; /root/reference/README.md) saved by
tf.train.Saver. This tool reads those checkpoints (requires tensorflow),
maps every variable through ``dc_tts_tpu.convert`` (reference scope names ->
param pytrees), and writes checkpoints loadable by
``dc_tts_tpu.train.checkpoint.restore`` / the synthesize CLI:

    python scripts/convert_tf_checkpoint.py \
        --text2mel /path/logdir-1 --ssrn /path/logdir-2 --out logdir/LJ01

Either flag may point to a checkpoint file prefix or a directory (the
latest checkpoint inside is used). Also accepts a .npz of
{tf_var_name: array} produced elsewhere, so conversion can run without TF.
Remember to synthesize with ``ln_eps=1e-12`` for strict forward parity
(PARITY.md deviation 2).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc_tts_tpu import convert  # noqa: E402
from dc_tts_tpu.config import base_config  # noqa: E402
from dc_tts_tpu.train import checkpoint  # noqa: E402


def load_tf_vars(path: str) -> dict:
    """Checkpoint prefix / directory / .npz -> {var_name: np.ndarray}."""
    if path.endswith(".npz"):
        with np.load(path) as d:
            return {k: d[k] for k in d.files}
    import tensorflow as tf
    if os.path.isdir(path):
        latest = tf.train.latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoint found in {path}")
        path = latest
    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--text2mel", required=True,
                    help="logdir-1 checkpoint (dir, prefix, or .npz)")
    ap.add_argument("--ssrn", required=True,
                    help="logdir-2 checkpoint (dir, prefix, or .npz)")
    ap.add_argument("--out", required=True,
                    help="output logdir (writes <out>-1 and <out>-2)")
    ap.add_argument("--step", type=int, default=None,
                    help="step to stamp (default: read gs/global_step "
                         "from the SSRN checkpoint, else 0)")
    args = ap.parse_args(argv)

    cfg = base_config()
    t2m_vars = load_tf_vars(args.text2mel)
    ssrn_vars = load_tf_vars(args.ssrn)

    t2m_params = convert.convert_text2mel(t2m_vars, cfg)
    ssrn_params = convert.convert_ssrn(ssrn_vars, cfg)

    step = args.step
    if step is None:
        step = int(ssrn_vars.get("gs/global_step", 0))

    import jax

    # bare param pytrees — the layout Synthesizer.from_checkpoints and the
    # synthesize CLI restore (pipeline.py)
    p1 = checkpoint.save(args.out + "-1", t2m_params, step)
    p2 = checkpoint.save(args.out + "-2", ssrn_params, step)
    n1 = sum(np.asarray(x).size for x in jax.tree.leaves(t2m_params))
    n2 = sum(np.asarray(x).size for x in jax.tree.leaves(ssrn_params))
    print(f"Text2Mel: {n1:,} params -> {p1}")
    print(f"SSRN:     {n2:,} params -> {p2}")
    print(f"step: {step}. Synthesize with ln_eps=1e-12 for strict parity.")


if __name__ == "__main__":
    main()
