"""Fused whole-loop Pallas decode: parity vs the XLA incremental path.

The fused kernel (ops/pallas_decode.py) must reproduce
Text2Mel.decode(mode="incremental") — itself oracle-tested equal to the
batch forward (tests/test_networks.py) — with f32 matmuls throughout.
Interpret mode on CPU; on-chip parity is checked by
scripts/decode_fused_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.ops.pallas_decode import fused_decode_supported

pytestmark = pytest.mark.skipif(not fused_decode_supported(),
                                reason="pallas unavailable")

CFG = test_config()


@pytest.fixture(scope="module")
def setup():
    model = Text2Mel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    ids = np.zeros((3, CFG.max_N), np.int32)
    for i in range(3):
        ids[i, : 6 + 3 * i] = (np.arange(6 + 3 * i) % 28) + 3
    return model, params, jnp.asarray(ids)


def test_fused_decode_matches_incremental(setup):
    model, params, ids = setup
    Y_ref, A_ref = model.decode(params, ids, mode="incremental")
    Y, A = model.decode(params, ids, mode="fused")
    assert Y.shape == Y_ref.shape and A.shape == A_ref.shape
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               atol=2e-5, rtol=0)


def test_fused_decode_cursor_trajectory_identical(setup):
    """The argmax cursor gates the monotonic window: its trajectory must
    match exactly (a one-frame divergence compounds), so compare the
    per-step argmax of the alignments."""
    model, params, ids = setup
    _, A_ref = model.decode(params, ids, mode="incremental")
    _, A = model.decode(params, ids, mode="fused")
    np.testing.assert_array_equal(np.asarray(A).argmax(axis=1),
                                  np.asarray(A_ref).argmax(axis=1))


def test_fused_decode_under_jit(setup):
    """The production Synthesizer jits decode over param TRACERS — the
    packing must trace."""
    model, params, ids = setup
    f = jax.jit(lambda p, i: model.decode(p, i, mode="fused")[0])
    Y = f(params, ids)
    Y_ref, _ = model.decode(params, ids, mode="incremental")
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref),
                               atol=2e-5, rtol=0)


def test_fused_decode_high3_parity_and_cursor(setup):
    """prec='high3' (hi/lo bf16 3-pass matmuls — half HIGHEST's MXU
    passes): the autoregressive feedback must not amplify the residual
    3-pass rounding into a cursor divergence. Gates (VERDICT r3 #4):
    identical cursor trajectory + Y within 1e-4 of the XLA path."""
    model, params, ids = setup
    Y_ref, A_ref = model.decode(params, ids, mode="incremental")
    Y, A = model.decode(params, ids, mode="fused", prec="high3")
    np.testing.assert_array_equal(np.asarray(A).argmax(axis=1),
                                  np.asarray(A_ref).argmax(axis=1))
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref),
                               atol=1e-4, rtol=0)


def test_fused_decode_hybrid_parity_and_cursor(setup):
    """prec='hybrid' (enc stack HIGHEST, dec stack 3-pass — measured
    interpret-mode Y error ~3.5x tighter than all-high3): trajectory and
    Y parity at test geometry. NOTE (r5, scripts/decode_fused_bench.py):
    at FULL geometry with random-init diffuse attention both reduced
    modes flip cursors at every init — argmax instability, not a
    precision-path bug — so both stay opt-in; this test pins the math,
    not default-safety."""
    model, params, ids = setup
    Y_ref, A_ref = model.decode(params, ids, mode="incremental")
    Y, A = model.decode(params, ids, mode="fused", prec="hybrid")
    np.testing.assert_array_equal(np.asarray(A).argmax(axis=1),
                                  np.asarray(A_ref).argmax(axis=1))
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref),
                               atol=1e-4, rtol=0)
