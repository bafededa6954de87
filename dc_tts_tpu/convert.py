"""Reference (TF1) checkpoint converter.

Maps the reference graph's variable names to this framework's pytrees so a
trained reference checkpoint can drive golden/parity tests. The TF variable
naming comes from the reference's scope structure:

* ``Graph.__init__`` wraps networks in scopes Text2Mel/{TextEnc, AudioEnc,
  Attention, AudioDec} and SSRN (train.py:49-77).
* each block gets ``C_{i}`` / ``HC_{i}`` / ``D_{i}`` with a single running
  counter per network (networks.py, the ``i += 1`` chains).
* tf.layers.conv1d -> ``<scope>/conv1d/{kernel,bias}``; conv2d_transpose ->
  ``<scope>/conv2d_transpose/{kernel,bias}`` (modules.py:134,232).
* layer norm -> ``<scope>/normalize/{beta,gamma}`` for conv blocks and
  ``<scope>/{H1,H2}/{beta,gamma}`` for HC blocks (modules.py:58-64,189-190).
* embedding -> ``embed_1/lookup_table`` (modules.py:33, networks.py:25).

Input: a flat ``{var_name: np.ndarray}`` dict (export a TF checkpoint with
any TF installation via ``tf.train.load_checkpoint`` ->
``{n: reader.get_tensor(n)}`` saved as .npz; this repo does not depend on
TF). Output: params pytrees matching Text2Mel.init / SSRN.init.

Weight layout conversions:
* conv kernels: TF (K, in, out) == ours, verbatim.
* deconv kernels: TF (1, K, out, in) -> ours w[k] = tf[0, k].T
  (see models/layers.py conv1d_transpose derivation).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .config import Config
from .models.blocks import C, D, HC
from .models.ssrn import ssrn_specs
from .models.text2mel import (audio_dec_specs, audio_enc_specs,
                              text_enc_specs)


def _block_param(tf_vars: Dict[str, np.ndarray], scope: str, spec):
    """Build one block's param dict from TF variables under `scope`."""
    if isinstance(spec, D):
        k = tf_vars[f"{scope}/conv2d_transpose/kernel"]  # (1, K, out, in)
        w = np.transpose(k[0], (0, 2, 1))                # (K, in, out)
        p = {"conv": {"w": np.ascontiguousarray(w),
                      "b": tf_vars[f"{scope}/conv2d_transpose/bias"]},
             "ln": {"beta": tf_vars[f"{scope}/normalize/beta"],
                    "gamma": tf_vars[f"{scope}/normalize/gamma"]}}
    elif isinstance(spec, HC):
        p = {"conv": {"w": tf_vars[f"{scope}/conv1d/kernel"],
                      "b": tf_vars[f"{scope}/conv1d/bias"]},
             "ln1": {"beta": tf_vars[f"{scope}/H1/beta"],
                     "gamma": tf_vars[f"{scope}/H1/gamma"]},
             "ln2": {"beta": tf_vars[f"{scope}/H2/beta"],
                     "gamma": tf_vars[f"{scope}/H2/gamma"]}}
    elif isinstance(spec, C):
        p = {"conv": {"w": tf_vars[f"{scope}/conv1d/kernel"],
                      "b": tf_vars[f"{scope}/conv1d/bias"]},
             "ln": {"beta": tf_vars[f"{scope}/normalize/beta"],
                    "gamma": tf_vars[f"{scope}/normalize/gamma"]}}
    else:
        raise TypeError(spec)
    return p


def _stack_scopes(specs, prefix: str, start_i: int) -> List[str]:
    """Reproduce the reference's per-network C_/HC_/D_ counter naming."""
    scopes = []
    i = start_i
    for spec in specs:
        tag = "D" if isinstance(spec, D) else \
            ("HC" if isinstance(spec, HC) else "C")
        scopes.append(f"{prefix}/{tag}_{i}")
        i += 1
    return scopes


def convert_text2mel(tf_vars: Dict[str, np.ndarray], cfg: Config) -> dict:
    """TF vars -> Text2Mel params pytree."""
    params: dict = {
        "embed": {"table": tf_vars["Text2Mel/TextEnc/embed_1/lookup_table"]},
    }
    # TextEnc blocks start at i=2 (embed consumed i=1, networks.py:25-28)
    params["text_enc"] = [
        _block_param(tf_vars, s, spec)
        for s, spec in zip(_stack_scopes(text_enc_specs(cfg),
                                         "Text2Mel/TextEnc", 2),
                           text_enc_specs(cfg))]
    params["audio_enc"] = [
        _block_param(tf_vars, s, spec)
        for s, spec in zip(_stack_scopes(audio_enc_specs(cfg),
                                         "Text2Mel/AudioEnc", 1),
                           audio_enc_specs(cfg))]
    params["audio_dec"] = [
        _block_param(tf_vars, s, spec)
        for s, spec in zip(_stack_scopes(audio_dec_specs(cfg),
                                         "Text2Mel/AudioDec", 1),
                           audio_dec_specs(cfg))]
    return params


def convert_ssrn(tf_vars: Dict[str, np.ndarray], cfg: Config) -> dict:
    return {"stack": [
        _block_param(tf_vars, s, spec)
        for s, spec in zip(_stack_scopes(ssrn_specs(cfg), "SSRN", 1),
                           ssrn_specs(cfg))]}


def convert(tf_vars: Dict[str, np.ndarray], cfg: Config
            ) -> Tuple[dict, dict]:
    """Full conversion -> (text2mel_params, ssrn_params)."""
    return convert_text2mel(tf_vars, cfg), convert_ssrn(tf_vars, cfg)


# ---------------------------------------------------------------------------
# inverse mapping (for tests and for exporting our checkpoints TF-style)


def export_tf_names(t2m_params: dict, ssrn_params: dict, cfg: Config
                    ) -> Dict[str, np.ndarray]:
    """Our pytrees -> flat dict under the reference's TF variable names."""
    out: Dict[str, np.ndarray] = {
        "Text2Mel/TextEnc/embed_1/lookup_table":
            np.asarray(t2m_params["embed"]["table"]),
    }

    def put_block(scope, spec, p):
        if isinstance(spec, D):
            w = np.asarray(p["conv"]["w"])  # (K, in, out)
            out[f"{scope}/conv2d_transpose/kernel"] = \
                np.transpose(w, (0, 2, 1))[None]  # (1, K, out, in)
            out[f"{scope}/conv2d_transpose/bias"] = np.asarray(p["conv"]["b"])
            out[f"{scope}/normalize/beta"] = np.asarray(p["ln"]["beta"])
            out[f"{scope}/normalize/gamma"] = np.asarray(p["ln"]["gamma"])
        elif isinstance(spec, HC):
            out[f"{scope}/conv1d/kernel"] = np.asarray(p["conv"]["w"])
            out[f"{scope}/conv1d/bias"] = np.asarray(p["conv"]["b"])
            out[f"{scope}/H1/beta"] = np.asarray(p["ln1"]["beta"])
            out[f"{scope}/H1/gamma"] = np.asarray(p["ln1"]["gamma"])
            out[f"{scope}/H2/beta"] = np.asarray(p["ln2"]["beta"])
            out[f"{scope}/H2/gamma"] = np.asarray(p["ln2"]["gamma"])
        else:
            out[f"{scope}/conv1d/kernel"] = np.asarray(p["conv"]["w"])
            out[f"{scope}/conv1d/bias"] = np.asarray(p["conv"]["b"])
            out[f"{scope}/normalize/beta"] = np.asarray(p["ln"]["beta"])
            out[f"{scope}/normalize/gamma"] = np.asarray(p["ln"]["gamma"])

    for scopes, specs, plist in [
        (_stack_scopes(text_enc_specs(cfg), "Text2Mel/TextEnc", 2),
         text_enc_specs(cfg), t2m_params["text_enc"]),
        (_stack_scopes(audio_enc_specs(cfg), "Text2Mel/AudioEnc", 1),
         audio_enc_specs(cfg), t2m_params["audio_enc"]),
        (_stack_scopes(audio_dec_specs(cfg), "Text2Mel/AudioDec", 1),
         audio_dec_specs(cfg), t2m_params["audio_dec"]),
        (_stack_scopes(ssrn_specs(cfg), "SSRN", 1),
         ssrn_specs(cfg), ssrn_params["stack"]),
    ]:
        for s, spec, p in zip(scopes, specs, plist):
            put_block(s, spec, p)
    return out
