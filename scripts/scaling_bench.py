"""Data-parallel scaling efficiency of batched synthesis.

Measures audio-s/s at mesh sizes 1, 2, 4, 8 (virtual CPU devices when run
under JAX_PLATFORMS=cpu with xla_force_host_platform_device_count, real
chips on a pod slice) with a fixed per-device batch (weak scaling — the
BASELINE.json "audio-seconds/s at 1 chip / 1 host / >=2 hosts" curve).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALE_CPU", "0") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.config import base_config, test_config
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.parallel.mesh import make_mesh
from dc_tts_tpu.pipeline import Synthesizer
from dc_tts_tpu import text as text_mod


def main():
    tiny = os.environ.get("SCALE_TINY", "0") == "1"
    cfg = test_config() if tiny else base_config()
    per_dev = int(os.environ.get("SCALE_PER_DEV_BATCH", "8"))
    n_dev = jax.device_count()
    print(f"platform {jax.devices()[0].platform}, {n_dev} devices, "
          f"per-device batch {per_dev}")

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t2m_params = Text2Mel(cfg).init(k1)
    ssrn_params = SSRN(cfg).init(k2)

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base_rate = None
    for s in sizes:
        mesh = make_mesh(data=s, model=1, devices=jax.devices()[:s])
        B = per_dev * s
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, cfg.max_N), 1,
                                 cfg.vocab_size)
        synth = Synthesizer(cfg, t2m_params, ssrn_params, mesh=mesh)
        wav, *_ = synth.synthesize_ids(ids)
        _ = np.asarray(jnp.sum(wav))  # compile+fence
        best = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            wav, *_ = synth.synthesize_ids(ids)
            _ = np.asarray(jnp.sum(wav))
            best = min(best, time.perf_counter() - t0)
        audio = B * wav.shape[-1] / cfg.sr
        rate = audio / best
        base_rate = base_rate or rate
        eff = rate / (base_rate * s) * 100.0
        print(f"devices={s:2d}  batch={B:3d}  {best:7.3f}s  "
              f"{rate:9.1f} audio-s/s  scaling-eff {eff:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
