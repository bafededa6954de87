"""Device mesh + sharding layout for DC-TTS.

The reference has NO distributed execution — one process, one device, with
Text2Mel/SSRN trained as two independent jobs (SURVEY §2.3). The TPU-native
parallelization is:

* **DP** (primary): utterance batches sharded over a ``data`` mesh axis;
  gradient all-reduce inserted by GSPMD over ICI (intra-slice) / DCN
  (multi-host). Used by both train steps and batched synthesis.
* **TP** (optional): a ``model`` axis shards the wide channel dimensions of
  conv kernels (2d=512 for Text2Mel, 2c=1024 for SSRN); activations stay
  replicated and XLA inserts the all-gathers/reduce-scatters.
* **Task parallelism**: the two train steps remain independent jit
  functions, runnable on disjoint submeshes — the reference's two-GPU split.

Everything routes through ``jax.sharding.NamedSharding``: pick a mesh,
annotate, let the compiler place collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_device_count() -> int:
    return jax.device_count()


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    devices = devices[:need]  # an explicit smaller mesh uses a device subset
    arr = mesh_utils.create_device_mesh((data, model),
                                        devices=np.asarray(devices))
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _conv_spec(shape, model_axis_size: int) -> P:
    """Partition rule for a conv kernel (K, Cin, Cout): shard Cout over
    'model' when it divides evenly; otherwise replicate."""
    if len(shape) == 3 and shape[-1] % model_axis_size == 0 and \
            shape[-1] >= 2 * model_axis_size:
        return P(None, None, "model")
    return P()


def param_partition_specs(params, mesh: Mesh):
    """PartitionSpec pytree for a model's params.

    TP rule: conv/deconv kernels shard their output-channel dim over
    'model'; everything else (biases, LN scales, embedding) is replicated.
    With model axis size 1 this degrades to full replication — the default
    DP configuration.
    """
    m = mesh.shape["model"]

    def spec(leaf):
        return _conv_spec(np.shape(leaf), m) if np.ndim(leaf) == 3 else P()

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh):
    specs = param_partition_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, leading dim over 'data'."""
    ds = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), batch)


def prefetch_to_device(batches, mesh: Mesh, size: int = 2):
    """Iterate host batches with device transfer overlapped against compute.

    ``jax.device_put`` is asynchronous: enqueueing the NEXT batch's
    host->device copy before yielding the current one lets the transfer run
    while the consumer's step executes. Feeding the step synchronously
    instead serializes copy and compute — measured on the axon-tunneled
    v5e, a synchronously-fed SSRN step is 2.9 s vs 0.2 s of actual step
    time (the (32,840,1025) mags batch alone is 110 MB). The reference
    gets the same overlap from its 8 queue-runner threads
    (/root/reference/data_load.py:122-129).
    """
    import collections

    buf = collections.deque()
    for b in batches:
        buf.append(shard_batch(b, mesh))
        if len(buf) >= max(1, size):
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def assert_sharded_like(tree, specs, mesh: Mesh) -> None:
    """Sharding-correctness check (the functional-purity analogue of a race
    detector, SURVEY §5): every leaf's actual sharding must equal the
    expected PartitionSpec on `mesh`. Raises AssertionError with the path.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path((tree, specs))
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    spec_leaves = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(leaves) == len(spec_leaves)
    for (path, leaf), spec in zip(leaves, spec_leaves):
        got = getattr(leaf, "sharding", None)
        want = NamedSharding(mesh, spec)
        if got is None or not got.is_equivalent_to(want, np.ndim(leaf)):
            raise AssertionError(
                f"sharding mismatch at {jax.tree_util.keystr(path)}: "
                f"got {got}, want {want}")
