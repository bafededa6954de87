import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.models.text2mel import Text2Mel, text_enc_specs, \
    audio_enc_specs, audio_dec_specs
from dc_tts_tpu.models.ssrn import SSRN


CFG = test_config()
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def t2m():
    model = Text2Mel(CFG)
    return model, model.init(KEY)


@pytest.fixture(scope="module")
def ssrn():
    model = SSRN(CFG)
    return model, model.init(jax.random.PRNGKey(1))


def _rand_ids(key, b, n):
    return jax.random.randint(key, (b, n), 1, CFG.vocab_size)


# ------------------------------------------------------------- shapes

def test_text_enc_shapes(t2m):
    model, params = t2m
    ids = _rand_ids(KEY, 2, CFG.max_N)
    K, V = model.text_encode(params, ids)
    assert K.shape == (2, CFG.max_N, CFG.d)
    assert V.shape == (2, CFG.max_N, CFG.d)


def test_full_forward_shapes(t2m):
    model, params = t2m
    ids = _rand_ids(KEY, 2, CFG.max_N)
    S = jax.random.uniform(KEY, (2, CFG.max_T, CFG.n_mels))
    logits, Y, align, maxatt = model.apply(params, ids, S)
    assert logits.shape == (2, CFG.max_T, CFG.n_mels)
    assert Y.shape == (2, CFG.max_T, CFG.n_mels)
    assert align.shape == (2, CFG.max_N, CFG.max_T)
    assert maxatt.shape == (2, CFG.max_T)
    assert float(Y.min()) >= 0 and float(Y.max()) <= 1


def test_ssrn_shapes(ssrn):
    model, params = ssrn
    Y = jax.random.uniform(KEY, (2, CFG.max_T, CFG.n_mels))
    logits, Z = model.apply(params, Y)
    assert Z.shape == (2, CFG.max_T * CFG.r, CFG.n_freq)
    assert float(Z.min()) >= 0 and float(Z.max()) <= 1


def test_param_counts_base_structure():
    """Layer counts mirror the reference stacks (networks.py)."""
    assert len(text_enc_specs(CFG)) == 2 + 8 + 2 + 2      # 14
    assert len(audio_enc_specs(CFG)) == 3 + 8 + 2          # 13
    assert len(audio_dec_specs(CFG)) == 1 + 4 + 2 + 3 + 1  # 11


# ------------------------------------------------------------- causality

def test_audio_enc_is_causal(t2m):
    model, params = t2m
    S = jax.random.uniform(KEY, (1, CFG.max_T, CFG.n_mels))
    Q0 = np.asarray(model.audio_encode(params, S))
    t = CFG.max_T // 2
    S2 = S.at[0, t].add(10.0)
    Q1 = np.asarray(model.audio_encode(params, S2))
    np.testing.assert_array_equal(Q0[0, :t], Q1[0, :t])
    assert np.abs(Q1[0, t:] - Q0[0, t:]).max() > 0


def test_audio_dec_is_causal(t2m):
    model, params = t2m
    R = jax.random.normal(KEY, (1, CFG.max_T, 2 * CFG.d))
    y0 = np.asarray(model.audio_decode(params, R))
    t = 7
    R2 = R.at[0, t].add(10.0)
    y1 = np.asarray(model.audio_decode(params, R2))
    np.testing.assert_array_equal(y0[0, :t], y1[0, :t])


def test_text_enc_is_not_causal(t2m):
    model, params = t2m
    ids = _rand_ids(KEY, 1, CFG.max_N)
    K0, _ = model.text_encode(params, ids)
    ids2 = ids.at[0, CFG.max_N - 1].set((ids[0, CFG.max_N - 1] % 30) + 1)
    K1, _ = model.text_encode(params, ids2)
    assert np.abs(np.asarray(K1 - K0)[0, 0]).max() > 0  # change propagates left


# ------------------------------------------------------------- attention

def test_attention_monotonic_window(t2m):
    model, params = t2m
    B, T, N, d = 2, 5, CFG.max_N, CFG.d
    Q = jax.random.normal(KEY, (B, T, d))
    K = jax.random.normal(jax.random.PRNGKey(2), (B, N, d))
    V = jax.random.normal(jax.random.PRNGKey(3), (B, N, d))
    prev = jnp.array([4, 9], jnp.int32)
    R, align, maxatt = model.attention(params, Q, K, V, monotonic=True,
                                       prev_max_attentions=prev)
    A = np.asarray(align)  # (B, N, T)
    win = CFG.attention_win_size
    for b, p in enumerate([4, 9]):
        inside = A[b, p: p + win, :].sum()
        outside = A[b].sum() - inside
        np.testing.assert_allclose(inside, T, atol=1e-4)  # all mass inside
        assert outside < 1e-4
        assert ((np.asarray(maxatt)[b] >= p) & (np.asarray(maxatt)[b] < p + win)).all()


def test_attention_rows_sum_to_one(t2m):
    model, params = t2m
    Q = jax.random.normal(KEY, (1, 4, CFG.d))
    K = jax.random.normal(KEY, (1, CFG.max_N, CFG.d))
    R, align, _ = model.attention(params, Q, K, K)
    np.testing.assert_allclose(np.asarray(align).sum(axis=1), 1.0, atol=1e-5)
    assert R.shape == (1, 4, 2 * CFG.d)


# ------------------------------------------------------------- decode equivalence

def reference_style_decode(model, params, ids, max_t):
    """The reference's synthesis loop, literally (synthesize.py:45-54):
    re-run the FULL graph every step on the whole padded mel buffer,
    keep only column j, carry prev_max_attentions = max_attentions[:, j].
    O(T^2) — the oracle our incremental decoder must match.
    """
    B = ids.shape[0]
    K, V = model.text_encode(params, ids)
    Y = jnp.zeros((B, max_t, model.cfg.n_mels), jnp.float32)
    prev = jnp.zeros((B,), jnp.int32)
    aligns = []
    for j in range(max_t):
        S = jnp.concatenate([jnp.zeros_like(Y[:, :1]), Y[:, :-1]], axis=1)
        Q = model.audio_encode(params, S)
        R, align, maxatt = model.attention(params, Q, K, V, monotonic=True,
                                           prev_max_attentions=prev)
        logits = model.audio_decode(params, R)
        y = jax.nn.sigmoid(logits)
        Y = Y.at[:, j].set(y[:, j])
        prev = maxatt[:, j].astype(jnp.int32)
        aligns.append(np.asarray(align[:, :, j]))
    return np.asarray(Y), np.stack(aligns, axis=-1)


def test_reference_mode_decode_equals_reference_loop(t2m):
    """THE core parity check: decode(mode='reference') reproduces the
    reference's O(T^2) full-recompute loop frame-for-frame, including the
    subtle re-masking of earlier attention columns by the current cursor."""
    model, params = t2m
    ids = _rand_ids(jax.random.PRNGKey(7), 2, CFG.max_N)
    max_t = 12  # keep the O(T^2) oracle cheap
    Y_ref, A_ref = reference_style_decode(model, params, ids, max_t)
    Y_got, A_got = model.decode(params, ids, max_t, mode="reference")
    np.testing.assert_allclose(np.asarray(Y_got), Y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(A_got), A_ref, atol=2e-5)


def test_incremental_decode_equals_stepwise_loop(t2m):
    """The fori_loop-driven incremental decode == a python loop over
    decode_step (plumbing check), and its attention rows use each step's
    OWN cursor."""
    model, params = t2m
    ids = _rand_ids(jax.random.PRNGKey(8), 2, CFG.max_N)
    max_t = 10
    K, V = model.text_encode(params, ids)
    state = model.init_decode_state(2, max_t)
    ys, als = [], []
    for t in range(max_t):
        y_t, a_t, state = model.decode_step(params, K, V, state, t)
        ys.append(np.asarray(y_t))
        als.append(np.asarray(a_t))
    Y_inc, A_inc = model.decode(params, ids, max_t, mode="incremental")
    np.testing.assert_allclose(np.asarray(Y_inc),
                               np.stack(ys, axis=1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(A_inc),
                               np.stack(als, axis=2), atol=1e-5)


def test_modes_agree_until_cursor_moves(t2m):
    """While the attention cursor stays at 0, every column's mask is
    identical in both modes, so outputs must agree frame-for-frame."""
    model, params = t2m
    ids = _rand_ids(jax.random.PRNGKey(7), 1, CFG.max_N)
    max_t = 12
    Y_ref, A_ref = model.decode(params, ids, max_t, mode="reference")
    Y_inc, A_inc = model.decode(params, ids, max_t, mode="incremental")
    cursor = np.asarray(A_inc).argmax(axis=1)[0]  # (T,) argmax over N
    moves = np.flatnonzero(cursor != 0)
    first_move = int(moves[0]) if moves.size else max_t - 1
    np.testing.assert_allclose(np.asarray(Y_inc)[:, :first_move + 1],
                               np.asarray(Y_ref)[:, :first_move + 1],
                               atol=2e-5)


def test_decode_jits_and_is_deterministic(t2m):
    model, params = t2m
    ids = _rand_ids(KEY, 2, CFG.max_N)
    dec = jax.jit(lambda p, i: model.decode(p, i, 8))
    Y1, _ = dec(params, ids)
    Y2, _ = dec(params, ids)
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y2))


def test_bfloat16_compute_close_to_f32(t2m, ssrn):
    """cfg.compute_dtype='bfloat16' runs matmuls in bf16 (f32 accumulate);
    outputs must track the f32 path closely."""
    model, params = t2m
    cfg16 = CFG.replace(compute_dtype="bfloat16")
    m16 = Text2Mel(cfg16)
    ids = _rand_ids(KEY, 2, CFG.max_N)
    S = jax.random.uniform(KEY, (2, CFG.max_T, CFG.n_mels))
    _, Y32, _, _ = model.apply(params, ids, S)
    _, Y16, _, _ = m16.apply(params, ids, S)
    # sigmoid outputs in [0,1]; bf16 mantissa ~3 decimal digits
    assert float(jnp.max(jnp.abs(Y32 - Y16))) < 0.05
    smodel, sparams = ssrn
    s16 = SSRN(cfg16)
    Ym = jax.random.uniform(KEY, (2, CFG.max_T, CFG.n_mels))
    _, Z32 = smodel.apply(sparams, Ym)
    _, Z16 = s16.apply(sparams, Ym)
    assert float(jnp.max(jnp.abs(Z32 - Z16))) < 0.05


def test_bfloat16_full_forward_close_to_f32():
    """compute_dtype="bfloat16_full" (bf16 activation storage, r5): both
    networks' forwards stay finite and within the bf16-rounding envelope
    of the f32 forward at tiny geometry. The loss-floor equivalence lives
    in the slow suite (test_learning); this fast check exercises the mode
    on every default run."""
    import jax
    import numpy as np
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.train.steps import teacher_forcing_shift

    cfg = test_config()
    cfg_bf = cfg.replace(compute_dtype="bfloat16_full")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(11), 4)
    ids = jax.random.randint(k1, (2, cfg.max_N), 1, cfg.vocab_size)
    mels = jax.random.uniform(k2, (2, cfg.max_T, cfg.n_mels))
    S = teacher_forcing_shift(mels)

    p = Text2Mel(cfg).init(k3)
    _, Y32, _, _ = Text2Mel(cfg).apply(p, ids, S)
    _, Ybf, _, _ = Text2Mel(cfg_bf).apply(p, ids, S)
    assert np.isfinite(np.asarray(Ybf)).all()
    # sigmoid outputs in [0,1]; ~0.4%/layer bf16 storage rounding compounds
    # through 11-13 layers + attention, staying within a few percent
    assert float(np.abs(np.asarray(Ybf) - np.asarray(Y32)).max()) < 0.2

    sp = SSRN(cfg).init(k4)
    _, Z32 = SSRN(cfg).apply(sp, mels)
    _, Zbf = SSRN(cfg_bf).apply(sp, mels)
    assert np.isfinite(np.asarray(Zbf)).all()
    assert float(np.abs(np.asarray(Zbf) - np.asarray(Z32)).max()) < 0.2
