"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dc_tts_tpu.config import test_config
from dc_tts_tpu.parallel import (make_mesh, data_sharding,
                                 param_partition_specs, shard_batch)
from dc_tts_tpu.parallel.mesh import shard_params
from dc_tts_tpu.train import (make_text2mel_step, make_ssrn_step,
                              init_text2mel_state, init_ssrn_state)


CFG = test_config().replace(B=8, warmup_steps=4.0)
KEY = jax.random.PRNGKey(0)


def _t2m_batch(key, b):
    k1, k2 = jax.random.split(key)
    return {
        "texts": jax.random.randint(k1, (b, CFG.max_N), 1, CFG.vocab_size),
        "mels": jax.random.uniform(k2, (b, CFG.max_T, CFG.n_mels)),
        "text_lens": jnp.full((b,), CFG.max_N // 2, jnp.int32),
        "mel_lens": jnp.full((b,), CFG.max_T - 2, jnp.int32),
    }


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_partition_specs_tp():
    mesh = make_mesh(data=4, model=2)
    state = init_text2mel_state(CFG, KEY)
    specs = param_partition_specs(state.params, mesh)
    # conv kernels (3D) with even out-ch shard on 'model'
    some = specs["text_enc"][0]["conv"]["w"]
    assert some == P(None, None, "model")
    # LN params replicated
    assert specs["text_enc"][0]["ln"]["gamma"] == P()


def test_dp_train_step_matches_single_device():
    """Data-parallel sharded step == single-device step on the same batch."""
    mesh = make_mesh()  # 8-way data parallel
    state = init_text2mel_state(CFG, KEY)
    batch = _t2m_batch(jax.random.PRNGKey(1), 8)
    rng = jax.random.PRNGKey(2)
    step = make_text2mel_step(CFG)

    # single device
    s1, m1 = jax.jit(step)(state, batch, rng)

    # sharded: batch over 'data', params replicated
    sharded_batch = shard_batch(batch, mesh)
    rep = NamedSharding(mesh, P())
    sharded_state = jax.device_put(state, rep)
    s2, m2 = jax.jit(step)(sharded_state, sharded_batch, rng)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    # cross-device psum reduction order differs from the single-device sum,
    # so allow small float noise
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ssrn_dp_step_runs_sharded():
    mesh = make_mesh()
    state = init_ssrn_state(CFG, KEY)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    batch = {
        "mels": jax.random.uniform(k1, (8, CFG.max_T, CFG.n_mels)),
        "mags": jax.random.uniform(k2, (8, CFG.max_T * CFG.r, CFG.n_freq)),
    }
    sharded_batch = shard_batch(batch, mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = jax.jit(make_ssrn_step(CFG))
    s2, m = step(state, sharded_batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))


def test_tp_sharded_params_forward_matches():
    """Tensor-parallel (channel-sharded) forward == replicated forward."""
    from dc_tts_tpu.models.ssrn import SSRN
    mesh = make_mesh(data=1, model=8)
    model = SSRN(CFG)
    params = model.init(KEY)
    Y = jax.random.uniform(KEY, (2, CFG.max_T, CFG.n_mels))
    _, Z1 = jax.jit(model.apply)(params, Y)
    p_sharded = shard_params(params, mesh)
    _, Z2 = jax.jit(model.apply)(p_sharded, Y)
    np.testing.assert_allclose(np.asarray(Z1), np.asarray(Z2), atol=1e-5)


def test_sharded_synthesis_pipeline():
    """Batched synthesis sharded over 'data' runs and matches unsharded.

    The mesh path is a shard_map over the FULL fused-kernel pipeline
    (whole-loop Pallas decode + whole-loop Pallas GL), so the sharded
    Synthesizer must keep decode_mode="fused" — not silently downgrade to
    the XLA incremental path as it did pre-round-5."""
    from dc_tts_tpu.pipeline import Synthesizer
    mesh = make_mesh()
    t2m = init_text2mel_state(CFG, KEY).params
    ssrn = init_ssrn_state(CFG, jax.random.PRNGKey(5)).params
    ids = jax.random.randint(jax.random.PRNGKey(6), (8, CFG.max_N), 1,
                             CFG.vocab_size)
    synth_sharded = Synthesizer(CFG, t2m, ssrn, mesh=mesh)
    assert synth_sharded.decode_mode == "fused"
    wav_s, Y_s, Z_s, _ = synth_sharded.synthesize_ids(ids)
    synth_local = Synthesizer(CFG, t2m, ssrn)
    wav_l, Y_l, Z_l, _ = synth_local.synthesize_ids(ids)
    np.testing.assert_allclose(np.asarray(Y_s), np.asarray(Y_l), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wav_s), np.asarray(wav_l),
                               atol=1e-3)


def test_sharded_synthesis_pads_uneven_batch():
    """A batch not divisible by the data-axis size is padded internally and
    sliced back — callers get exactly their B rows, equal to the unsharded
    result."""
    from dc_tts_tpu.pipeline import Synthesizer
    mesh = make_mesh()  # data=8
    t2m = init_text2mel_state(CFG, KEY).params
    ssrn = init_ssrn_state(CFG, jax.random.PRNGKey(5)).params
    ids = jax.random.randint(jax.random.PRNGKey(7), (5, CFG.max_N), 1,
                             CFG.vocab_size)
    wav_s, Y_s, Z_s, align_s = Synthesizer(
        CFG, t2m, ssrn, mesh=mesh).synthesize_ids(ids)
    assert Y_s.shape[0] == 5 and wav_s.shape[0] == 5
    assert Z_s.shape[0] == 5 and align_s.shape[0] == 5
    wav_l, Y_l, _, _ = Synthesizer(CFG, t2m, ssrn).synthesize_ids(ids)
    np.testing.assert_allclose(np.asarray(Y_s), np.asarray(Y_l), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wav_s), np.asarray(wav_l),
                               atol=1e-3)


def test_assert_sharded_like():
    from dc_tts_tpu.parallel.mesh import assert_sharded_like
    mesh = make_mesh()
    tree = {"a": jnp.ones((8, 4)), "b": jnp.ones((3,))}
    specs = {"a": P("data"), "b": P()}
    placed = {
        "a": jax.device_put(tree["a"], NamedSharding(mesh, P("data"))),
        "b": jax.device_put(tree["b"], NamedSharding(mesh, P())),
    }
    assert_sharded_like(placed, specs, mesh)  # passes
    with pytest.raises(AssertionError, match="sharding mismatch"):
        assert_sharded_like(
            {"a": placed["b"][:2].reshape(1, 2), "b": placed["b"]},
            specs, mesh)


def test_prefetch_to_device_preserves_batches():
    """prefetch_to_device must yield every batch, in order, already placed
    with the data sharding — identical to calling shard_batch directly."""
    from dc_tts_tpu.parallel.mesh import prefetch_to_device

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    batches = [{"x": rng.random((8, 4), np.float32).astype(np.float32),
                "i": np.full((8,), k, np.int32)} for k in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == len(batches)
    ds = data_sharding(mesh)
    for got, want in zip(out, batches):
        assert got["x"].sharding.is_equivalent_to(ds, got["x"].ndim)
        np.testing.assert_array_equal(np.asarray(got["x"]), want["x"])
        np.testing.assert_array_equal(np.asarray(got["i"]), want["i"])


def test_sharded_chunked_synthesis_rounds_chunk_to_mesh():
    """synthesize_ids_chunked under a mesh: chunk sizes that don't divide
    the 'data' axis (e.g. the default 40 on 8 devices... or 3 here) must
    be rounded up internally — shard_map needs even shards (the pre-r5
    GSPMD path padded internally, so this regressed silently)."""
    from dc_tts_tpu.pipeline import Synthesizer
    mesh = make_mesh()  # data=8
    t2m = init_text2mel_state(CFG, KEY).params
    ssrn = init_ssrn_state(CFG, jax.random.PRNGKey(5)).params
    ids = jax.random.randint(jax.random.PRNGKey(8), (6, CFG.max_N), 1,
                             CFG.vocab_size)
    synth = Synthesizer(CFG, t2m, ssrn, mesh=mesh)
    got = synth.synthesize_ids_chunked(np.asarray(ids), chunk=3)
    want, _, _, _ = Synthesizer(CFG, t2m, ssrn).synthesize_ids(ids)
    assert got.shape == np.asarray(want).shape
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-3)
