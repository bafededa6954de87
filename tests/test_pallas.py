"""Pallas kernels vs their jax.lax oracles (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.models import blocks as B
from dc_tts_tpu.ops.pallas_blocks import (fused_conv_ln_act, fused_hc,
                                          pallas_supported)

if not pallas_supported():  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)

KEY = jax.random.PRNGKey(0)
EPS = 1e-5


@pytest.mark.parametrize("size,rate,causal", [
    (1, 1, False), (3, 1, False), (3, 3, False),
    (3, 1, True), (3, 27, True),
])
def test_fused_hc_matches_block(size, rate, causal):
    spec = B.HC(size, rate, causal)
    C = 16
    params, _ = B.init_stack(KEY, C, [spec])
    p = params[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, C))
    want = B.apply_block(p, spec, x, ln_eps=EPS, dropout_rate=0.0,
                         rng=None, train=False)
    got = fused_hc(x, p["conv"]["w"], p["conv"]["b"],
                   p["ln1"]["gamma"], p["ln1"]["beta"],
                   p["ln2"]["gamma"], p["ln2"]["beta"],
                   size=size, rate=rate, causal=causal, eps=EPS,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("size,rate,causal,act", [
    (1, 1, False, None), (3, 1, False, "relu"),
    (3, 3, True, None), (1, 1, True, "relu"),
])
def test_fused_conv_matches_block(size, rate, causal, act):
    spec = B.C(size, rate, 24, act, causal)
    params, _ = B.init_stack(KEY, 16, [spec])
    p = params[0]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 16))
    want = B.apply_block(p, spec, x, ln_eps=EPS, dropout_rate=0.0,
                         rng=None, train=False)
    got = fused_conv_ln_act(x, p["conv"]["w"], p["conv"]["b"],
                            p["ln"]["gamma"], p["ln"]["beta"],
                            size=size, rate=rate, causal=causal, act=act,
                            eps=EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
