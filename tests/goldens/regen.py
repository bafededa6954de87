"""Regenerate the golden fixtures — run ONLY when semantics change on
purpose: python tests/goldens/regen.py"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dc_tts_tpu.config import test_config  # noqa: E402
from dc_tts_tpu.models.ssrn import SSRN  # noqa: E402
from dc_tts_tpu.models.text2mel import Text2Mel  # noqa: E402


def main():
    cfg = test_config()
    t2m, ssrn = Text2Mel(cfg), SSRN(cfg)
    p1 = t2m.init(jax.random.PRNGKey(0))
    p2 = ssrn.init(jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, cfg.max_N), 1,
                             cfg.vocab_size)
    S = jax.random.uniform(jax.random.PRNGKey(3), (2, cfg.max_T, cfg.n_mels))
    logits, Y, align, _ = t2m.apply(p1, ids, S)
    Yd, Ad = t2m.decode(p1, ids, 8)
    _, Z = ssrn.apply(p2, Y)
    out = os.path.join(os.path.dirname(__file__), "tiny_outputs.npz")
    np.savez(out, ids=np.asarray(ids), S=np.asarray(S),
             logits=np.asarray(logits), Y=np.asarray(Y),
             align=np.asarray(align), Yd=np.asarray(Yd), Ad=np.asarray(Ad),
             Z=np.asarray(Z))
    print("regenerated", out)


def regen_mel_basis():
    """Regenerate the librosa-transcription mel golden (see
    tests/test_mel_golden.py for why this is the strongest available pin:
    librosa itself is not installable in this image)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_mel_golden import _librosa_mel_oracle
    basis = _librosa_mel_oracle(22050, 2048, 80).astype(np.float32)
    out = os.path.join(os.path.dirname(__file__), "mel_basis.npz")
    np.savez(out, basis_22050_2048_80=basis)
    print("regenerated", out)


if __name__ == "__main__":
    main()
    regen_mel_basis()
