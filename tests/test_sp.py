"""Sequence-parallel (time-sharded) SSRN tests on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dc_tts_tpu.config import test_config
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.parallel.mesh import make_mesh
from dc_tts_tpu.parallel.sp import ssrn_apply_sp, apply_stack_sp
from dc_tts_tpu.models.blocks import C, D, HC, apply_stack, init_stack
from jax.sharding import PartitionSpec as P


CFG = test_config()
KEY = jax.random.PRNGKey(0)


def test_ssrn_sp_matches_unsharded():
    """Time-sharded SSRN over 8 shards == unsharded forward."""
    mesh = make_mesh()  # 8 on 'data'
    model = SSRN(CFG)
    params = model.init(KEY)
    Y = jax.random.uniform(jax.random.PRNGKey(1), (2, CFG.max_T, CFG.n_mels))
    _, Z_ref = model.apply(params, Y)
    Z_sp = ssrn_apply_sp(CFG, params, Y, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(Z_sp), np.asarray(Z_ref),
                               atol=2e-5)


@pytest.mark.parametrize("specs", [
    (C(3, 1, 8, "relu"), C(3, 3, None, None)),
    (HC(3, 1), HC(3, 3)),
    (C(1, 1, 6), D(3), HC(3, 1)),
])
def test_stack_sp_matches_batch_apply(specs):
    """Generic halo-exchange stacks == the plain batch apply."""
    mesh = make_mesh()
    params, _ = init_stack(KEY, 4, specs)
    T = 32  # divisible by 8 shards -> 4 frames per shard
    x = jax.random.normal(jax.random.PRNGKey(2), (2, T, 4))
    want = apply_stack(params, specs, x, ln_eps=CFG.ln_eps)

    def local(p, xl):
        return apply_stack_sp(p, specs, xl, axis_name="data",
                              ln_eps=CFG.ln_eps)

    got = jax.shard_map(local, mesh=mesh,
                        in_specs=(P(), P(None, "data", None)),
                        out_specs=P(None, "data", None))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_halo_wider_than_shard_is_rejected_or_correct():
    """Dilation 3 halo (3 frames) with tiny 4-frame shards still works
    because the halo never exceeds one shard at these specs."""
    mesh = make_mesh()
    specs = (HC(3, 3),)
    params, _ = init_stack(KEY, 4, specs)
    x = jax.random.normal(KEY, (1, 32, 4))
    want = apply_stack(params, specs, x, ln_eps=CFG.ln_eps)

    def local(p, xl):
        return apply_stack_sp(p, specs, xl, axis_name="data",
                              ln_eps=CFG.ln_eps)

    got = jax.shard_map(local, mesh=mesh,
                        in_specs=(P(), P(None, "data", None)),
                        out_specs=P(None, "data", None))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
