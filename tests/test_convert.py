import jax
import numpy as np

from dc_tts_tpu.config import test_config
from dc_tts_tpu.convert import convert, export_tf_names
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.models.ssrn import SSRN


CFG = test_config()


def test_convert_roundtrip():
    """our params -> TF-named dict -> convert -> identical pytrees."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t2m = Text2Mel(CFG).init(k1)
    ssrn = SSRN(CFG).init(k2)
    tf_vars = export_tf_names(t2m, ssrn, CFG)

    # names follow the reference scope structure
    assert "Text2Mel/TextEnc/embed_1/lookup_table" in tf_vars
    assert "Text2Mel/TextEnc/C_2/conv1d/kernel" in tf_vars
    assert "Text2Mel/TextEnc/HC_4/H1/beta" in tf_vars
    assert "Text2Mel/AudioEnc/C_1/conv1d/kernel" in tf_vars
    assert "Text2Mel/AudioDec/C_1/conv1d/kernel" in tf_vars
    assert "SSRN/D_4/conv2d_transpose/kernel" in tf_vars
    assert "SSRN/C_16/conv1d/kernel" in tf_vars
    # deconv kernel exported in TF layout (1, K, out, in)
    assert tf_vars["SSRN/D_4/conv2d_transpose/kernel"].shape[0] == 1

    t2m2, ssrn2 = convert(tf_vars, CFG)
    for a, b in zip(jax.tree.leaves(t2m), jax.tree.leaves(t2m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ssrn), jax.tree.leaves(ssrn2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converted_params_run():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    t2m = Text2Mel(CFG).init(k1)
    ssrn = SSRN(CFG).init(k2)
    tf_vars = export_tf_names(t2m, ssrn, CFG)
    t2m2, ssrn2 = convert(tf_vars, CFG)
    ids = jax.random.randint(k1, (1, CFG.max_N), 1, CFG.vocab_size)
    Y, _ = Text2Mel(CFG).decode(t2m2, ids, 6)
    _, Z = SSRN(CFG).apply(ssrn2, Y)
    assert np.isfinite(np.asarray(Z)).all()
