"""Pallas HC training kernel (custom VJP) vs its jax.lax oracle
(interpret mode on CPU). The eval-mode per-block kernels and the
single-step attention kernel were retired in round 4 (measured XLA-losers
at production geometry; the whole-loop decode kernel owns synthesis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.models import blocks as B
from dc_tts_tpu.ops.pallas_common import pallas_supported

if not pallas_supported():  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)

KEY = jax.random.PRNGKey(0)
EPS = 1e-5


# ----------------------------------------------------- custom VJP HC kernel

@pytest.mark.parametrize("size,rate,causal", [
    (3, 1, True), (3, 3, False), (1, 1, True), (3, 27, True),
])
def test_hc_custom_vjp_matches_jax_grad(size, rate, causal):
    """Hand-written pallas backward == autodiff of the lax block."""
    from dc_tts_tpu.ops.pallas_hc_vjp import hc_block_trainable
    spec = B.HC(size, rate, causal)
    C = 16
    params, _ = B.init_stack(KEY, C, [spec])
    p = params[0]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, C))
    cot_key = jax.random.PRNGKey(4)

    def ref_loss(x, w, b, g1, b1, g2, b2):
        pp = {"conv": {"w": w, "b": b},
              "ln1": {"gamma": g1, "beta": b1},
              "ln2": {"gamma": g2, "beta": b2}}
        y = B.apply_block(pp, spec, x, ln_eps=EPS, dropout_rate=0.0,
                          rng=None, train=False)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    def pal_loss(x, w, b, g1, b1, g2, b2):
        y = hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal,
                               EPS, True)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    args = (x, p["conv"]["w"], p["conv"]["b"], p["ln1"]["gamma"],
            p["ln1"]["beta"], p["ln2"]["gamma"], p["ln2"]["beta"])
    # forward parity
    np.testing.assert_allclose(float(ref_loss(*args)),
                               float(pal_loss(*args)), rtol=1e-5)
    g_ref = jax.grad(ref_loss, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(pal_loss, argnums=tuple(range(7)))(*args)
    names = ["dx", "dw", "db", "dg1", "db1", "dg2", "db2"]
    for n, a, b_ in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-4, err_msg=n)


def test_hc_vjp_time_tiled(monkeypatch):
    """A shrunken VMEM budget forces the inner time-tile loop in BOTH
    fwd and bwd kernels; gradients must still match autodiff (this is the
    path full SSRN/Text2Mel training geometry takes)."""
    from dc_tts_tpu.ops import pallas_common as PB
    from dc_tts_tpu.ops import pallas_hc_vjp as PV
    size, rate, causal, C = 3, 2, True, 16
    spec = B.HC(size, rate, causal)
    params, _ = B.init_stack(KEY, C, [spec])
    p = params[0]
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 100, C))
    cot_key = jax.random.PRNGKey(10)

    monkeypatch.setattr(PB, "VMEM_BUDGET", 110_000)
    tt = PB.choose_time_tile(100, lambda t: PV._bwd_vmem(100, C, size, t,
                                                         rate))
    assert tt is not None and tt < 100  # bwd really tiles

    def ref_loss(x, w, b, g1, b1, g2, b2):
        pp = {"conv": {"w": w, "b": b},
              "ln1": {"gamma": g1, "beta": b1},
              "ln2": {"gamma": g2, "beta": b2}}
        y = B.apply_block(pp, spec, x, ln_eps=EPS, dropout_rate=0.0,
                          rng=None, train=False)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    def pal_loss(x, w, b, g1, b1, g2, b2):
        y = PV.hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate,
                                  causal, EPS, True)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    args = (x, p["conv"]["w"], p["conv"]["b"], p["ln1"]["gamma"],
            p["ln1"]["beta"], p["ln2"]["gamma"], p["ln2"]["beta"])
    np.testing.assert_allclose(float(ref_loss(*args)),
                               float(pal_loss(*args)), rtol=1e-5)
    g_ref = jax.grad(ref_loss, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(pal_loss, argnums=tuple(range(7)))(*args)
    for n, a, b_ in zip(["dx", "dw", "db", "dg1", "db1", "dg2", "db2"],
                        g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-4, err_msg=n)


# ------------------------------------------- wired product-path equivalence

def test_use_pallas_train_grads_match_default():
    """Training forward+grads with cfg.use_pallas=True (hand-written HC
    VJP for blocks that fit VMEM) must match the XLA path."""
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.text2mel import Text2Mel

    cfg = test_config()
    params = Text2Mel(cfg).init(jax.random.PRNGKey(13))
    ids = jax.random.randint(jax.random.PRNGKey(14), (2, cfg.max_N), 1,
                             cfg.vocab_size)
    S = jax.random.uniform(jax.random.PRNGKey(15), (2, cfg.max_T,
                                                    cfg.n_mels))

    def loss(p, cfg_):
        logits, Y, _, _ = Text2Mel(cfg_).apply(p, ids, S, train=True,
                                               rng=jax.random.PRNGKey(0))
        return jnp.mean(jnp.abs(Y)) + jnp.mean(logits ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg.replace(use_pallas=True))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b_ in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=5e-5)


def test_hc_custom_vjp_bf16_matches_jax_grad():
    """bf16-operand mode of the trainable HC kernel: gradients match
    autodiff of the XLA bf16 conv block. Both paths cast matmul operands
    to bf16 with f32 accumulation, but round at different points, so the
    bar is bf16-noise on unit-scale data (the f32 test above pins 2e-4)."""
    from dc_tts_tpu.ops.pallas_hc_vjp import hc_block_trainable
    size, rate, causal = 3, 3, True
    spec = B.HC(size, rate, causal)
    C = 16
    params, _ = B.init_stack(KEY, C, [spec])
    p = params[0]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, C))
    cot_key = jax.random.PRNGKey(4)

    def ref_loss(x, w, b, g1, b1, g2, b2):
        pp = {"conv": {"w": w, "b": b},
              "ln1": {"gamma": g1, "beta": b1},
              "ln2": {"gamma": g2, "beta": b2}}
        y = B.apply_block(pp, spec, x, ln_eps=EPS, dropout_rate=0.0,
                          rng=None, train=False, dtype=jnp.bfloat16)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    def pal_loss(x, w, b, g1, b1, g2, b2):
        y = hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal,
                               EPS, True, True)
        return jnp.sum(y * jax.random.normal(cot_key, y.shape))

    args = (x, p["conv"]["w"], p["conv"]["b"], p["ln1"]["gamma"],
            p["ln1"]["beta"], p["ln2"]["gamma"], p["ln2"]["beta"])
    np.testing.assert_allclose(float(ref_loss(*args)),
                               float(pal_loss(*args)), rtol=5e-3)
    g_ref = jax.grad(ref_loss, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(pal_loss, argnums=tuple(range(7)))(*args)
    names = ["dx", "dw", "db", "dg1", "db1", "dg2", "db2"]
    for n, a, b_ in zip(names, g_ref, g_pal):
        scale = max(1e-3, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-2 * scale, err_msg=n)


def test_use_pallas_bf16_train_grads_close():
    """cfg.use_pallas + compute_dtype=bfloat16 (the fast-training combo)
    produces finite grads close to the XLA bf16 path on a real stack."""
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.train.steps import teacher_forcing_shift
    cfg = test_config().replace(compute_dtype="bfloat16", dropout_rate=0.0)
    model = Text2Mel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.max_N), 1,
                             cfg.vocab_size)
    mels = jax.random.uniform(jax.random.PRNGKey(2),
                              (2, cfg.max_T, cfg.n_mels))

    def loss(params, cfg):
        S = teacher_forcing_shift(mels)
        _, Y, _, _ = Text2Mel(cfg).apply(params, ids, S, train=True)
        return jnp.mean(jnp.abs(Y - mels))

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg.replace(use_pallas=True))
    assert np.isfinite(float(l1))
    assert abs(float(l0) - float(l1)) < 5e-3
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.isfinite(np.asarray(b_)).all()
        scale = max(1e-3, float(jnp.abs(a).max()))
        assert float(jnp.abs(a - b_).max()) < 5e-2 * scale
