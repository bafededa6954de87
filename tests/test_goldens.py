"""Golden regression tests: frozen outputs of the tiny models.

Guards the numerics of every refactor (layer rewrites, Pallas swaps,
layout changes): model outputs for fixed seeds/inputs must stay within
float tolerance of the committed fixtures. Regenerate deliberately with
``python tests/goldens/regen.py`` when semantics change ON PURPOSE.
"""
import os

import jax
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel


GOLD = os.path.join(os.path.dirname(__file__), "goldens", "tiny_outputs.npz")
CFG = test_config()


@pytest.fixture(scope="module")
def gold():
    with np.load(GOLD) as d:
        return {k: d[k] for k in d.files}


@pytest.fixture(scope="module")
def models():
    t2m = Text2Mel(CFG)
    ssrn = SSRN(CFG)
    return (t2m, t2m.init(jax.random.PRNGKey(0)),
            ssrn, ssrn.init(jax.random.PRNGKey(1)))


def test_teacher_forced_forward_matches_golden(gold, models):
    t2m, p1, _, _ = models
    logits, Y, align, _ = t2m.apply(p1, gold["ids"], gold["S"])
    np.testing.assert_allclose(np.asarray(logits), gold["logits"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(Y), gold["Y"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(align), gold["align"], atol=1e-4)


def test_incremental_decode_matches_golden(gold, models):
    t2m, p1, _, _ = models
    Yd, Ad = t2m.decode(p1, gold["ids"], 8)
    np.testing.assert_allclose(np.asarray(Yd), gold["Yd"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ad), gold["Ad"], atol=1e-4)


def test_ssrn_matches_golden(gold, models):
    _, _, ssrn, p2 = models
    _, Z = ssrn.apply(p2, gold["Y"])
    np.testing.assert_allclose(np.asarray(Z), gold["Z"], atol=1e-4)
