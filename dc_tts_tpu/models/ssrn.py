"""SSRN: spectrogram super-resolution network.

Coarse mel (B, T/r, n_mels) -> full linear spectrogram (B, T, 1 + n_fft/2).
Architecture contract from the reference (``/root/reference/networks.py:214-292``):

C(c,1) -> HC(3,1) -> HC(3,3) -> 2x[ D(stride2) -> HC(3,1) -> HC(3,3) ]
-> C(2c,1) -> 2x HC(3,1) -> C(1+n_fft/2, 1) -> 2x C(1,relu) -> C(1)
-> sigmoid.  All non-causal; the two deconvs upsample T/4 -> T (r=4).

Pure feed-forward conv stack — on TPU this is a chain of MXU matmuls over
(B*T, K*C); it is also the natural target for sequence-parallel sharding of
the time axis (halo exchange of (K-1)*rate/2 frames per block).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .blocks import C, D, HC, apply_stack, init_stack


def ssrn_specs(cfg: Config):
    c = cfg.c
    assert cfg.r == 4, "SSRN's two stride-2 deconvs implement exactly r=4"
    specs = [C(1, 1, c, None)]
    specs += [HC(3, 3 ** j) for j in range(2)]
    for _ in range(2):
        specs += [D(3)]
        specs += [HC(3, 3 ** j) for j in range(2)]
    specs += [C(1, 1, 2 * c, None)]
    specs += [HC(3, 1), HC(3, 1)]
    specs += [C(1, 1, cfg.n_freq, None)]
    specs += [C(1, 1, None, "relu"), C(1, 1, None, "relu")]
    specs += [C(1, 1, None, None)]
    return tuple(specs)


@dataclass(frozen=True)
class SSRN:
    cfg: Config

    def init(self, key) -> dict:
        params, out = init_stack(key, self.cfg.n_mels, ssrn_specs(self.cfg))
        assert out == self.cfg.n_freq
        return {"stack": params}

    def apply(self, params, Y, *, rng=None, train=False
              ) -> Tuple[jax.Array, jax.Array]:
        """Y (B, T/r, n_mels) -> (Z_logits, Z) each (B, T, n_freq)."""
        cfg = self.cfg
        dtype = {"bfloat16": jnp.bfloat16,
                 "bfloat16_full": jnp.bfloat16,
                 "float32_high": "high"}.get(cfg.compute_dtype)
        # "bfloat16_full": ALSO carry inter-block activations in bf16
        # (see blocks.apply_stack) — the bf16 step is activation-traffic
        # bound, not MXU bound (BASELINE.md round-5 measurements)
        act_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16_full"
                     else None)
        logits = apply_stack(params["stack"], ssrn_specs(cfg), Y,
                             ln_eps=cfg.ln_eps,
                             dropout_rate=cfg.dropout_rate,
                             rng=rng, train=train, dtype=dtype,
                             remat=cfg.remat, use_pallas=cfg.use_pallas,
                             act_dtype=act_dtype)
        logits = logits.astype(jnp.float32)  # loss math stays f32
        return logits, jax.nn.sigmoid(logits)
