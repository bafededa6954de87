import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.models import layers as L
from dc_tts_tpu.models import blocks as B


KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------- embedding

def test_embedding_zero_pad_row():
    p = L.init_embedding(KEY, 10, 8)
    out = L.embedding_lookup(p, jnp.array([[0, 3, 0]]))
    assert out.shape == (1, 3, 8)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.zeros(8))
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.zeros(8))
    assert np.abs(np.asarray(out[0, 1])).sum() > 0


def test_embedding_grad_skips_pad_row():
    p = L.init_embedding(KEY, 10, 8)

    def loss(p):
        return jnp.sum(L.embedding_lookup(p, jnp.array([[0, 1, 2]])) ** 2)

    g = jax.grad(loss)(p)["table"]
    np.testing.assert_array_equal(np.asarray(g[0]), np.zeros(8))
    assert np.abs(np.asarray(g[1])).sum() > 0


# ------------------------------------------------------------- layer norm

def test_layer_norm_matches_manual():
    p = L.init_layer_norm(16)
    p = {"gamma": p["gamma"] * 2.0, "beta": p["beta"] + 0.5}
    x = jax.random.normal(KEY, (3, 5, 16))
    y = np.asarray(L.layer_norm(p, x))
    xn = np.asarray(x)
    mean = xn.mean(-1, keepdims=True)
    var = xn.var(-1, keepdims=True)
    want = (xn - mean) / np.sqrt(var + 1e-12) * 2.0 + 0.5
    np.testing.assert_allclose(y, want, atol=1e-5)


# ------------------------------------------------------------- conv1d

def naive_dilated_conv(x, w, b, rate, causal):
    """Loop oracle: y[t] = sum_k x[t - (K-1-k)*rate] @ w[k] (causal)."""
    Bb, T, cin = x.shape
    K, _, cout = w.shape
    total = (K - 1) * rate
    left = total if causal else total // 2
    y = np.zeros((Bb, T, cout), np.float64)
    for t in range(T):
        for k in range(K):
            src = t + k * rate - left
            if 0 <= src < T:
                y[:, t] += x[:, src] @ w[k]
    return y + b


@pytest.mark.parametrize("size,rate,causal", [
    (1, 1, False), (3, 1, False), (3, 3, False), (3, 9, False),
    (3, 1, True), (3, 3, True), (3, 27, True),
])
def test_conv1d_matches_loop_oracle(size, rate, causal):
    k1, k2 = jax.random.split(KEY)
    p = L.init_conv(k1, 6, 5, size)
    x = jax.random.normal(k2, (2, 40, 6))
    got = np.asarray(L.conv1d(p, x, size=size, rate=rate, causal=causal))
    want = naive_dilated_conv(np.asarray(x, np.float64),
                              np.asarray(p["w"], np.float64),
                              np.asarray(p["b"], np.float64), rate, causal)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv1d_causality():
    """Perturbing the input at t must not change outputs before t."""
    k1, k2 = jax.random.split(KEY)
    p = L.init_conv(k1, 4, 4, 3)
    x = jax.random.normal(k2, (1, 30, 4))
    y0 = np.asarray(L.conv1d(p, x, size=3, rate=9, causal=True))
    x2 = x.at[0, 15].add(100.0)
    y1 = np.asarray(L.conv1d(p, x2, size=3, rate=9, causal=True))
    np.testing.assert_array_equal(y0[0, :15], y1[0, :15])
    assert np.abs(y1[0, 15:] - y0[0, 15:]).max() > 0


# ------------------------------------------------------------- deconv

def test_conv1d_transpose_matches_lax_oracle():
    """Our interleave formulation == XLA's conv_transpose (TF SAME semantics)."""
    k1, k2 = jax.random.split(KEY)
    p = L.init_deconv(k1, 6, 4, 3)
    x = jax.random.normal(k2, (2, 10, 6))
    got = np.asarray(L.conv1d_transpose(p, x))
    assert got.shape == (2, 20, 4)

    # oracle: the gradient-of-strided-conv (TF conv2d_transpose semantics);
    # our w (K, Cin, Cout) is the forward-conv kernel (K, I=Cout, O=Cin)
    # transposed, so feed w.transpose(0,2,1) with transpose_kernel=True.
    w = np.asarray(p["w"])  # (K, Cin, Cout)
    want = jax.lax.conv_transpose(
        np.asarray(x), np.ascontiguousarray(w.transpose(0, 2, 1)),
        strides=(2,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True)
    np.testing.assert_allclose(got, np.asarray(want) + np.asarray(p["b"]),
                               atol=1e-4)


def test_conv1d_transpose_loop_oracle():
    """Direct check of the y[2t] / y[2t+1] index math."""
    k1, k2 = jax.random.split(KEY)
    p = L.init_deconv(k1, 3, 2, 3)
    x = jax.random.normal(k2, (1, 5, 3))
    got = np.asarray(L.conv1d_transpose(p, x))
    xn = np.asarray(x, np.float64)
    w = np.asarray(p["w"], np.float64)
    b = np.asarray(p["b"], np.float64)
    want = np.zeros((1, 10, 2))
    for t in range(5):
        want[:, 2 * t] = xn[:, t] @ w[0] + (xn[:, t - 1] @ w[2] if t > 0 else 0)
        want[:, 2 * t + 1] = xn[:, t] @ w[1]
    np.testing.assert_allclose(got, want + b, atol=1e-4)


# ------------------------------------------------------------- blocks

def test_hc_block_gate_identity_at_zero_conv():
    """With conv weights ~0, sigmoid(LN(0))=0.5 -> y = 0.5*LN(0)+0.5*x = 0.5x."""
    spec = B.HC(3, 1, False)
    params, _ = B.init_stack(KEY, 4, [spec])
    p = jax.tree.map(jnp.zeros_like, params[0])
    p["ln1"]["gamma"] = jnp.ones(4)
    p["ln2"]["gamma"] = jnp.ones(4)
    x = jax.random.normal(KEY, (1, 8, 4))
    y = np.asarray(B.apply_block(p, spec, x, ln_eps=1e-12, dropout_rate=0.0,
                                 rng=None, train=False))
    np.testing.assert_allclose(y, 0.5 * np.asarray(x), atol=1e-5)


def test_stack_channels_tracking():
    specs = [B.C(1, 1, 8), B.HC(3, 1), B.C(1, 1, 16), B.D(3), B.C(1, 1, 4)]
    chs = B.stack_in_channels(specs, 2)
    assert chs == [2, 8, 8, 16, 16]
    params, out = B.init_stack(KEY, 2, specs)
    assert out == 4
    x = jax.random.normal(KEY, (2, 6, 2))
    y = B.apply_stack(params, specs, x)
    assert y.shape == (2, 12, 4)  # one deconv doubles T


def test_dropout_train_vs_eval():
    x = jnp.ones((4, 100, 8))
    y_eval = L.dropout(x, 0.5, jax.random.PRNGKey(1), train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_train = np.asarray(L.dropout(x, 0.5, jax.random.PRNGKey(1), train=True))
    assert (y_train == 0).any()
    # inverted dropout preserves expectation
    assert abs(y_train.mean() - 1.0) < 0.1


def test_highway_layer():
    """Classic highway net (reference modules.py:67-89, dead code there but
    part of the public primitive set)."""
    p = L.init_highway(KEY, 8)
    x = jax.random.normal(KEY, (2, 5, 8))
    y = L.highway(p, x)
    assert y.shape == x.shape
    # with the -1 gate bias and small weights, output stays close to input
    assert float(jnp.mean(jnp.abs(y - x))) < 1.0
    # zero weights + zero h -> y = sigmoid(-1) mix of 0 and x
    p0 = jax.tree.map(jnp.zeros_like, p)
    p0["t"]["b"] = jnp.full((8,), -1.0)
    y0 = np.asarray(L.highway(p0, x))
    t = 1.0 / (1.0 + np.exp(1.0))
    np.testing.assert_allclose(y0, np.asarray(x) * (1 - t), atol=1e-5)
