"""Sequence-parallel Griffin-Lim == unsharded Griffin-Lim."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.dsp.griffin_lim import griffin_lim
from dc_tts_tpu.dsp.stft import stft
from dc_tts_tpu.parallel.mesh import make_mesh
from dc_tts_tpu.parallel.sp_gl import griffin_lim_sp


CFG = test_config()


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sp_griffin_lim_matches_unsharded(n_shards):
    mesh = make_mesh(data=n_shards, model=1,
                     devices=jax.devices()[:n_shards])
    # frames per shard must exceed the sample halo: own = F/n * hop > 248
    F = 32 * 8  # 256 frames -> >= 32/shard at hop 8
    rng = np.random.default_rng(0)
    y = rng.standard_normal(F * CFG.hop_length - 1).astype(np.float32) * 0.2
    mag = jnp.abs(stft(jnp.asarray(y)[None], CFG.n_fft, CFG.hop_length,
                       CFG.win_length))  # (1, F, n_freq)
    assert mag.shape[1] == F

    want = np.asarray(griffin_lim(mag, CFG.n_fft, CFG.hop_length,
                                  CFG.win_length, n_iter=4, method="dft"))
    got = np.asarray(griffin_lim_sp(mag, CFG.replace(n_iter=4), mesh,
                                    axis="data"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_sp_griffin_lim_batched():
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    F = 128
    mag = jnp.asarray(np.random.default_rng(1).uniform(
        0, 0.5, (3, F, CFG.n_freq)).astype(np.float32))
    want = np.asarray(griffin_lim(mag, CFG.n_fft, CFG.hop_length,
                                  CFG.win_length, n_iter=3, method="dft"))
    got = np.asarray(griffin_lim_sp(mag, CFG.replace(n_iter=3), mesh))
    np.testing.assert_allclose(got, want, atol=2e-3)
