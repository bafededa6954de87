"""End-to-end synthesis pipeline: text -> mel -> linear spec -> waveform.

The reference's synthesis (``/root/reference/synthesize.py:21-68``) uploads
the full mel buffer host->device 210 times, then runs SSRN once, then
Griffin-Lims each utterance serially on host CPU. Here the whole chain —
incremental Text2Mel decode, SSRN, Griffin-Lim — is ONE jitted
device-resident function over the batch, optionally sharded over a device
mesh ('data' axis) for multi-chip batched synthesis.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .dsp.features import trim_silence
from .dsp.griffin_lim import spectrogram_to_wav, gl_consts
from .models.ssrn import SSRN
from .models.text2mel import Text2Mel
from . import text as text_mod


def _replicate(tree, mesh):
    """Place every leaf replicated over `mesh`, tolerating leaves that are
    host arrays, locally-committed jax arrays, or already mesh-placed.
    Multi-process safe: values go through the host (the same value is
    assumed on every process — the checkpoint/init contract)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(
                rep, np.ndim(x)):
            return x
        return jax.device_put(np.asarray(jax.device_get(x)), rep)

    return jax.tree.map(put, tree)


def _shard_rows(ids: np.ndarray, mesh) -> "jax.Array":
    """Host batch (same on every process) -> jax.Array sharded over the
    'data' axis. make_array_from_callback, not device_put: multi-process
    JAX rejects non-trivially-sharded numpy jit inputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    ids = np.asarray(ids)
    ds = NamedSharding(mesh, P("data"))
    return jax.make_array_from_callback(ids.shape, ds,
                                        lambda idx: ids[idx])


def _pad_rows(ids: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the batch dim up to a multiple with PAD(0) rows (they decode
    garbage and are sliced off by the caller)."""
    ids = np.asarray(ids)
    B = ids.shape[0]
    padded = -(-B // multiple) * multiple
    if padded == B:
        return ids
    return np.concatenate(
        [ids, np.zeros((padded - B, ids.shape[1]), ids.dtype)], axis=0)


class Synthesizer:
    """Holds both networks' params and compiled synthesis functions.

    Params come from the two-namespace checkpoint contract: Text2Mel from
    logdir-1, SSRN from logdir-2 (reference synthesize.py:32-41) — see
    ``from_checkpoints``.
    """

    def __init__(self, cfg: Config, t2m_params, ssrn_params, *,
                 mesh=None, decode_mode: str = "auto",
                 pcm16: bool = False, ssrn_precision: str = "high",
                 decode_prec: str = "highest"):
        if decode_mode == "auto":
            # fused = the whole-loop Pallas decode kernel (parity 2e-6 vs
            # incremental, ~1.2x faster on chip). Under a mesh the synth fn
            # is wrapped in jax.shard_map over the 'data' axis (see _build),
            # so each device runs the SAME fused kernels on its local batch
            # shard — GSPMD never has to partition a pallas_call.
            decode_mode = "fused"
        self.cfg = cfg
        self.text2mel = Text2Mel(cfg)
        # ssrn_precision: SSRN conv matmul mode for SYNTHESIS only —
        # "high" (the default: f32 operands, 3-pass MXU accumulation;
        # measured 59.6 vs 86.3 ms at B=40 on v5e with 7.4e-5 relative
        # output error — far below GL's quality floor, and no
        # autoregressive feedback amplifies it), "highest" (f32 6-pass,
        # bit-level parity with the TF-golden path — use for strict
        # parity checks against converted reference weights), or "bf16"
        # (40.4 ms but 1.7e-2 mag noise; opt-in). Text2Mel stays f32
        # (its decode feedback flips attention cursors at lower
        # precision, see ops/pallas_decode.py). CPU backends ignore
        # precision hints, so off-TPU "high" == "highest" exactly.
        ssrn_cfg = {"highest": cfg,
                    "high": cfg.replace(compute_dtype="float32_high"),
                    "bf16": cfg.replace(compute_dtype="bfloat16"),
                    }[ssrn_precision]
        self.ssrn = SSRN(ssrn_cfg)
        if mesh is not None:
            # Params may arrive with training-time shardings (e.g. TP
            # output-channel splits). The synthesis jit pins replicated
            # in_shardings, and jit refuses to silently reshard committed
            # arrays — so replicate explicitly here (via host for
            # multi-process meshes, where device_put cannot reshard a
            # locally-committed array onto non-addressable devices).
            t2m_params = _replicate(t2m_params, mesh)
            ssrn_params = _replicate(ssrn_params, mesh)
        self.t2m_params = t2m_params
        self.ssrn_params = ssrn_params
        self.mesh = mesh
        self.decode_mode = decode_mode
        # decode_prec: fused-kernel matmul mode — "highest" (default; the
        # mode whose XLA parity holds unconditionally), "hybrid" (enc
        # HIGHEST / dec 3-pass, 30.7 vs 43.3 ms at B=40) or "high3" (all
        # 3-pass, 29.6 ms). The reduced modes are OPT-IN for trained
        # checkpoints only: at random init they flip the attention cursor
        # (argmax instability under diffuse attention — measured across
        # 10 inits, scripts/decode_fused_bench.py); trained (sharp)
        # attention has the margins random init lacks.
        self.decode_prec = decode_prec
        # pcm16: quantize waveforms to 16-bit PCM ON DEVICE. The output is
        # the standard wav delivery format, and the device->host transfer
        # halves — the transfer is a first-order cost for remote/tunneled
        # TPUs (~0.9 s of a 2.4 s batch-40 synthesis on a tunneled v5e).
        self.pcm16 = pcm16
        self._synth_fn = self._build(decode_mode)

    @classmethod
    def from_checkpoints(cls, cfg: Config, logdir1: str, logdir2: str,
                         key=None, **kw):
        t2m_params, ssrn_params = restore_synthesis_params(
            cfg, logdir1, logdir2, key)
        return cls(cfg, t2m_params, ssrn_params, **kw)

    # ------------------------------------------------------------------
    def _build(self, decode_mode: str):
        cfg = self.cfg
        # DFT matrices enter the jit as ARGUMENTS, not closure constants:
        # embedded literals make the Griffin-Lim stage compile minutes
        # slower (and re-ship 33 MB per executable) over the axon tunnel.
        self._gl_mats = gl_consts(cfg)
        if self.mesh is not None:
            # multi-process meshes need the consts explicitly replicated
            # (a locally-committed array cannot be resharded cross-process
            # by the jit's in_shardings)
            self._gl_mats = _replicate(self._gl_mats, self.mesh)

        pcm16 = self.pcm16

        def synth(t2m_params, ssrn_params, ids, gl_mats):
            Y, align = self.text2mel.decode(t2m_params, ids,
                                            mode=decode_mode,
                                            prec=self.decode_prec)
            _, Z = self.ssrn.apply(ssrn_params, Y)
            wav = spectrogram_to_wav(Z, cfg, gl_mats)
            if pcm16:
                wav = jnp.round(
                    jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
            return wav, Y, Z, align

        if self.mesh is not None:
            # shard_map, not plain GSPMD sharding: the production decode and
            # Griffin-Lim paths are single pallas_calls that GSPMD cannot
            # partition across devices. shard_map splits the batch BEFORE
            # tracing, so every device runs the full fused-kernel pipeline
            # on its local (B / n_data) shard; params/consts are replicated.
            # check_vma=False because pallas_call outputs carry no
            # replication info for the unmapped 'model' axis.
            from jax.sharding import NamedSharding, PartitionSpec as P
            ds = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            mapped = jax.shard_map(
                synth, mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P()),
                out_specs=(P("data"), P("data"), P("data"), P("data")),
                check_vma=False)
            return jax.jit(mapped,
                           in_shardings=(rep, rep, ds, rep),
                           out_shardings=(ds, ds, ds, ds))
        return jax.jit(synth)

    # ------------------------------------------------------------------
    def synthesize_ids(self, ids: np.ndarray):
        """ids (B, max_N) int32 -> (wavs (B, n_samples), Y, Z, align).

        Under a mesh the batch is padded up to a multiple of the 'data'
        axis size (shard_map needs even shards; PAD rows decode garbage
        and are sliced off) — callers see the original B unchanged.
        """
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            B = np.asarray(ids).shape[0]
            padded = _shard_rows(_pad_rows(ids, nd), self.mesh)
            outs = self._synth_fn(self.t2m_params, self.ssrn_params,
                                  padded, self._gl_mats)
            return (tuple(o[:B] for o in outs)
                    if padded.shape[0] != B else outs)
        return self._synth_fn(self.t2m_params, self.ssrn_params, ids,
                              self._gl_mats)

    def synthesize_ids_chunked(self, ids: np.ndarray, chunk: int = 40
                               ) -> np.ndarray:
        """Arbitrary-size batches (e.g. the full 720-sentence Harvard set)
        as fixed-shape chunks -> wavs (B, n_samples) on host.

        All chunks are DISPATCHED before any result is pulled: JAX's async
        dispatch queues them on the device, so the device->host transfer of
        chunk i (the ~0.9 s/batch tunnel cost) overlaps the compute of
        chunks i+1... — double-buffering without explicit streams. The last
        chunk is padded to the static shape (one compile total) and sliced.
        Under a mesh the chunk size itself is first rounded up to a
        multiple of the 'data' axis size — shard_map needs even shards
        (the pre-r5 GSPMD path padded internally; shard_map does not).
        """
        ids = np.asarray(ids)
        B = ids.shape[0]
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            chunk = -(-chunk // nd) * nd
        futures = []
        for i in range(0, B, chunk):
            # pad: PAD rows decode garbage, dropped below
            part = _pad_rows(ids[i: i + chunk], chunk)
            if self.mesh is not None:
                part = _shard_rows(part, self.mesh)
            futures.append(self._synth_fn(self.t2m_params, self.ssrn_params,
                                          part, self._gl_mats)[0])
        for w in futures:
            # start every device->host copy as soon as its chunk computes:
            # without this, chunk i+1's transfer waits for np.asarray(i) to
            # be REQUESTED, leaving the (slow, ~20-40 MB/s tunneled) link
            # idle while the host assembles earlier chunks
            try:
                w.copy_to_host_async()
            except AttributeError:  # non-jax arrays in tests
                pass
        wavs = np.concatenate([np.asarray(w) for w in futures], axis=0)
        return wavs[:B]

    def synthesize(self, sentences: Sequence[str], *, trim: bool = True):
        """Raw sentences -> list of float32 waveforms (host, trimmed).

        Mirrors the reference's final per-utterance trim (utils.py:92).
        """
        ids = text_mod.encode_batch(list(sentences), self.cfg)
        wavs, _, _, _ = self.synthesize_ids(jnp.asarray(ids))
        wavs = np.asarray(wavs)
        if wavs.dtype == np.int16:  # pcm16 delivery -> back to float for trim
            wavs = wavs.astype(np.float32) / 32767.0
        if trim:
            return [trim_silence(w) for w in wavs]
        return list(wavs)


def synthesize_time_sharded(cfg: Config, t2m_params, ssrn_params, ids, *,
                            n_shards: int = 0, decode_mode: str = "fused"):
    """Sequence-parallel synthesis: shard the TIME axis, not utterances.

    Text2Mel decodes the batch on one device (the autoregressive loop has
    no time parallelism to expose), then the SSRN conv stack and the
    Griffin-Lim loop run time-sharded across ``n_shards`` devices with
    per-conv / per-iteration halo exchanges (``parallel/sp.py``,
    ``parallel/sp_gl.py``) — the long-utterance latency axis that
    per-utterance DP cannot cover. Constraints: cfg.max_T must divide by
    n_shards and each GL shard must exceed the OLA halo (see
    ``griffin_lim_sp``). Returns (wav (B, samples), Y, Z, align).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.mesh import make_mesh
    from .parallel.sp import ssrn_apply_sp
    from .parallel.sp_gl import time_sharded_vocoder

    n = n_shards or len(jax.devices())
    if cfg.max_T % n:
        raise ValueError(
            f"--time-shard {n} must divide the frame grid: max_T="
            f"{cfg.max_T} (and max_T*r={cfg.max_T * cfg.r} GL frames)")
    mesh = make_mesh(data=n, model=1)
    t2m = Text2Mel(cfg)
    Y, align = jax.jit(
        lambda p, i: t2m.decode(p, i, mode=decode_mode))(t2m_params, ids)
    Y = jax.device_put(Y, NamedSharding(mesh, P(None, "data", None)))
    Z = ssrn_apply_sp(cfg, ssrn_params, Y, mesh)
    wav = time_sharded_vocoder(Z, cfg, mesh)
    return wav, Y, Z, align


def restore_synthesis_params(cfg: Config, logdir1: str, logdir2: str,
                             key=None):
    """(t2m_params, ssrn_params) from the two checkpoint namespaces
    (reference synthesize.py:32-41) — shared by Synthesizer.from_checkpoints
    and the CLI's pipeline branch."""
    from .train import checkpoint
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    t2m_params, _ = checkpoint.restore(logdir1, Text2Mel(cfg).init(k1))
    ssrn_params, _ = checkpoint.restore(logdir2, SSRN(cfg).init(k2))
    return t2m_params, ssrn_params


class PipelinedSynthesizer:
    """Pipeline-parallel batched synthesis over two device groups.

    Stage 1 (Text2Mel autoregressive decode) and stage 2 (SSRN +
    Griffin-Lim) run on DISJOINT submeshes; microbatches stream through, so
    stage 2 vocodes microbatch i while stage 1 decodes microbatch i+1 (JAX
    async dispatch overlaps them automatically because the stages own
    different devices). This is the TPU-native generalization of the
    reference's two-GPU task split (README.md:32 trains the two nets on two
    GPUs; here the same boundary pipelines inference).
    """

    def __init__(self, cfg: Config, t2m_params, ssrn_params, *,
                 devices=None, microbatch: int = 8,
                 ssrn_precision: str = "high"):
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import make_mesh

        devices = devices if devices is not None else _jax.devices()
        assert len(devices) >= 2, "pipeline needs >= 2 devices"
        half = len(devices) // 2
        other = len(devices) - half
        if microbatch % half or microbatch % other:
            # a clear error beats the opaque GSPMD sharding failure a
            # non-divisible microbatch would hit deep inside jit
            raise ValueError(
                f"--microbatch {microbatch} must be divisible by both "
                f"stage submesh sizes ({half} and {other} of {len(devices)} "
                f"devices)")
        self.cfg = cfg
        self.microbatch = microbatch
        self.mesh1 = make_mesh(data=half, model=1, devices=devices[:half])
        self.mesh2 = make_mesh(data=len(devices) - half, model=1,
                               devices=devices[half:])
        self._ds1 = NamedSharding(self.mesh1, P("data"))
        self._ds2 = NamedSharding(self.mesh2, P("data"))
        rep1 = NamedSharding(self.mesh1, P())
        rep2 = NamedSharding(self.mesh2, P())
        self.t2m_params = jax.device_put(t2m_params, rep1)
        self.ssrn_params = jax.device_put(ssrn_params, rep2)

        t2m = Text2Mel(cfg)
        # same synthesis-time SSRN precision ladder as Synthesizer
        ssrn = SSRN({"highest": cfg,
                     "high": cfg.replace(compute_dtype="float32_high"),
                     "bf16": cfg.replace(compute_dtype="bfloat16"),
                     }[ssrn_precision])

        # Both stages run the production Pallas kernels (fused decode, the
        # whole-loop GL2), which GSPMD cannot partition — shard_map each
        # stage over its submesh's 'data' axis so every device runs the
        # kernels on its local microbatch shard (same rationale as
        # Synthesizer._build).
        from jax import shard_map

        self._stage1 = jax.jit(
            shard_map(lambda p, ids: t2m.decode(p, ids, mode="fused")[0],
                      mesh=self.mesh1, in_specs=(P(), P("data")),
                      out_specs=P("data"), check_vma=False),
            in_shardings=(rep1, self._ds1), out_shardings=self._ds1)

        self._gl_mats = gl_consts(cfg)

        def stage2(p, Y, gl_mats):
            _, Z = ssrn.apply(p, Y)
            return spectrogram_to_wav(Z, cfg, gl_mats)

        self._stage2 = jax.jit(
            shard_map(stage2, mesh=self.mesh2,
                      in_specs=(P(), P("data"), P()),
                      out_specs=P("data"), check_vma=False),
            in_shardings=(rep2, self._ds2, rep2),
            out_shardings=self._ds2)

    def synthesize_ids(self, ids) -> np.ndarray:
        """ids (B, max_N) -> wavs (B, n_samples). Arbitrary B: the batch
        is padded to a microbatch multiple internally (pad rows decode
        garbage and are dropped), like synthesize_ids_chunked."""
        B = np.asarray(ids).shape[0]
        mb = self.microbatch
        ids = _pad_rows(ids, mb)
        ys = []
        for i in range(0, ids.shape[0], mb):
            chunk = jax.device_put(ids[i: i + mb], self._ds1)
            Y = self._stage1(self.t2m_params, chunk)
            # hop the stage boundary; async dispatch lets stage 1 of the
            # next microbatch overlap stage 2 of this one
            ys.append(self._stage2(self.ssrn_params,
                                   jax.device_put(Y, self._ds2),
                                   self._gl_mats))
        return np.concatenate([np.asarray(w) for w in ys], axis=0)[:B]
