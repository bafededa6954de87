"""Multi-PROCESS communication backend, exercised without hardware.

`parallel/distributed.initialize` wires a process into a pod slice via
`jax.distributed.initialize`. Everything else in the suite runs
single-process over 8 virtual devices; this test actually spawns TWO
OS processes (2 virtual CPU devices each), forms a global 4-device mesh
over gRPC/DCN, and runs one DP Text2Mel train step — asserting both
processes agree and that the loss equals the single-process 4-device
result (a wrong cross-process gradient reduction would diverge).

Marked slow: two fresh JAX runtimes cost ~30 s.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from dc_tts_tpu.parallel import distributed
distributed.initialize()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from dc_tts_tpu.config import test_config
from dc_tts_tpu.parallel.mesh import make_mesh, param_partition_specs
from dc_tts_tpu.train.steps import init_text2mel_state, make_text2mel_step

info = distributed.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

cfg = test_config().replace(B=4)
mesh = make_mesh(data=4, model=1)

# identical full batch on every process (deterministic keys); shard via
# make_array_from_callback so each process places only its local shards
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
full = {
    "texts": np.asarray(jax.random.randint(k1, (cfg.B, cfg.max_N), 1,
                                           cfg.vocab_size)),
    "mels": np.asarray(jax.random.uniform(k2, (cfg.B, cfg.max_T,
                                                cfg.n_mels))),
    "text_lens": np.full((cfg.B,), cfg.max_N // 2, np.int32),
    "mel_lens": np.full((cfg.B,), cfg.max_T, np.int32),
}
ds = NamedSharding(mesh, P("data"))
batch = {k: jax.make_array_from_callback(v.shape, ds,
                                         lambda idx, v=v: v[idx])
         for k, v in full.items()}

state = init_text2mel_state(cfg, jax.random.PRNGKey(0))
rep = NamedSharding(mesh, P())
state = state._replace(
    params=jax.tree.map(
        lambda x: jax.make_array_from_callback(np.shape(x), rep,
                                               lambda idx, x=x: np.asarray(x)[idx]),
        state.params),
    opt_state=jax.tree.map(
        lambda x: jax.make_array_from_callback(np.shape(x), rep,
                                               lambda idx, x=x: np.asarray(x)[idx]),
        state.opt_state))

with mesh:
    step = jax.jit(make_text2mel_step(cfg))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])

print("RESULT " + json.dumps({"pid": info["process_index"], "loss": loss}),
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": ROOT + os.pathsep + env.get("PYTHONPATH", ""),
        })
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r["loss"]

    assert set(results) == {0, 1}
    # both processes hold the same replicated loss
    assert abs(results[0] - results[1]) < 1e-6, results

    # single-process oracle: same batch, same init, 4 virtual devices
    # (the suite's own runtime already has 8 — reuse devices[:4])
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from dc_tts_tpu.train.steps import (init_text2mel_state,
                                        make_text2mel_step)

    cfg = test_config().replace(B=4)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = shard_batch({
        "texts": jax.random.randint(k1, (cfg.B, cfg.max_N), 1,
                                    cfg.vocab_size),
        "mels": jax.random.uniform(k2, (cfg.B, cfg.max_T, cfg.n_mels)),
        "text_lens": np.full((cfg.B,), cfg.max_N // 2, np.int32),
        "mel_lens": np.full((cfg.B,), cfg.max_T, np.int32),
    }, mesh)
    state = init_text2mel_state(cfg, jax.random.PRNGKey(0))
    with mesh:
        _, metrics = jax.jit(make_text2mel_step(cfg))(
            state, batch, jax.random.PRNGKey(2))
    want = float(metrics["loss"])
    assert abs(results[0] - want) / abs(want) < 1e-5, (results, want)


CHILD_SYNTH = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from dc_tts_tpu.parallel import distributed
distributed.initialize()

import jax.numpy as jnp
import numpy as np
from dc_tts_tpu.config import test_config
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu.parallel.mesh import make_mesh
from dc_tts_tpu.pipeline import Synthesizer

info = distributed.process_info()
assert info["process_count"] == 2, info
cfg = test_config()
mesh = make_mesh(data=4, model=1)

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
t2m = Text2Mel(cfg).init(k1)
ssrn = SSRN(cfg).init(k2)
ids = np.asarray(jax.random.randint(jax.random.PRNGKey(3),
                                    (4, cfg.max_N), 1, cfg.vocab_size))

with mesh:
    synth = Synthesizer(cfg, t2m, ssrn, mesh=mesh)
    assert synth.decode_mode == "fused"
    wav, Y, Z, align = synth.synthesize_ids(ids)
    dig = jax.jit(lambda w, y: jnp.stack(
        [jnp.sum(jnp.abs(w.astype(jnp.float32))),
         jnp.sum(jnp.abs(y))]))(wav, Y)
    dw, dy = float(dig[0]), float(dig[1])

print("RESULT " + json.dumps({"pid": info["process_index"],
                              "wav": dw, "Y": dy}), flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh_synthesis_matches_single_process(tmp_path):
    """The r5 shard_map synthesis path over a REAL 2-OS-process mesh:
    both processes run the fused-kernel pipeline on their local shards
    and must agree with each other and with the single-process result —
    the multi-host half of the mesh-synthesis story (virtual-mesh tests
    cover the single-process half)."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": ROOT + os.pathsep + env.get("PYTHONPATH", ""),
        })
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_SYNTH], env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = (r["wav"], r["Y"])
    assert set(results) == {0, 1}
    assert abs(results[0][0] - results[1][0]) < 1e-3, results
    assert abs(results[0][1] - results[1][1]) < 1e-4, results

    # single-process oracle: same params/ids, mesh over 4 local devices
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dc_tts_tpu.config import test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.parallel.mesh import make_mesh
    from dc_tts_tpu.pipeline import Synthesizer

    cfg = test_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t2m = Text2Mel(cfg).init(k1)
    ssrn = SSRN(cfg).init(k2)
    ids = np.asarray(jax.random.randint(jax.random.PRNGKey(3),
                                        (4, cfg.max_N), 1, cfg.vocab_size))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with mesh:
        wav, Y, _, _ = Synthesizer(cfg, t2m, ssrn,
                                   mesh=mesh).synthesize_ids(ids)
    want_w = float(jnp.sum(jnp.abs(wav.astype(jnp.float32))))
    want_y = float(jnp.sum(jnp.abs(Y)))
    assert abs(results[0][0] - want_w) / max(want_w, 1e-9) < 1e-4, (
        results, want_w)
    assert abs(results[0][1] - want_y) / max(want_y, 1e-9) < 1e-5, (
        results, want_y)
