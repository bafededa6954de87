"""Training CLI: ``python -m dc_tts_tpu.train {1,2}``.

Mirrors the reference's UX (``python train.py 1`` for Text2Mel, ``2`` for
SSRN, ``/root/reference/train.py:137-162``): infinite loop over shuffled
batches, checkpoint + alignment plot every 1000 steps, resume from the
latest checkpoint on restart, stop at num_iterations. Adds standard flags
for data/log dirs, mesh shape, and step limits.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import base_config
from ..data.dataset import TrainLoader, load_dataset_index
from ..parallel.mesh import (make_mesh, param_partition_specs,
                             prefetch_to_device)
from ..utils.logging import MetricLogger
from ..utils.plotting import plot_alignment
from . import checkpoint
from .steps import (init_ssrn_state, init_text2mel_state, make_ssrn_step,
                    make_text2mel_step)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train Text2Mel (1) or SSRN (2)")
    ap.add_argument("num", type=int, choices=[1, 2])
    ap.add_argument("--data", default=None, help="corpus dir (transcript.csv)")
    ap.add_argument("--features", default=".",
                    help="dir containing mels/ and mags/ from prepro")
    ap.add_argument("--on-the-fly", action="store_true",
                    help="compute spectrograms in the loader threads "
                         "instead of reading prepro's .npy features — the "
                         "reference's prepro=False mode (hyperparams.py:10, "
                         "data_load.py:104-113). No prepro run needed; "
                         "composes with --buckets (mel lengths estimated "
                         "from wav headers)")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--keep-ckpts", type=int, default=5,
                    help="checkpoints retained (tf.train.Saver's "
                         "max_to_keep default); 0 keeps all")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--data-parallel", type=int, default=None,
                    help="data mesh axis size (default: all devices)")
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="use the tiny test config (CI smoke runs)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "bfloat16_full"],
                    help="conv matmul operand dtype. bfloat16 streams "
                         "operands through the MXU at bf16 rate with f32 "
                         "accumulation (~2x steps/s; loss floor pinned "
                         "equal to f32 by tests/test_learning.py). "
                         "bfloat16_full ALSO stores activations (conv "
                         "outputs, LN/gate chains, residuals) in bf16 — "
                         "the bf16 step is HBM-bound on those f32 chains, "
                         "not on matmuls; measured SSRN 83.5 -> 68.5 "
                         "ms/step, t2m 41.7 -> 38.4 (LN stats still "
                         "compute f32; loss floor pinned equal to f32)")
    ap.add_argument("--rng", default="rbg", choices=["rbg", "threefry"],
                    help="PRNG implementation for dropout masks. rbg "
                         "(default) uses the TPU hardware RNG — measured "
                         "to make the 38 per-layer dropout draws ~free "
                         "(t2m bf16 57.9 -> 46.2 ms/step, SSRN 104 -> 85; "
                         "scripts/train_diag.py). threefry restores "
                         "cross-backend bitwise mask reproducibility")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files (scalars + "
                         "mel/mag/alignment images) into the logdir")
    ap.add_argument("--buckets", type=int, default=3,
                    help="number of static length-bucket shapes (the "
                         "reference buckets by text length, "
                         "data_load.py:122-129). Default 3: measured "
                         "+27-60%% steps/s on LJ-length corpora "
                         "(BASELINE.md) at the cost of one XLA compile "
                         "per bucket shape; loss-floor equivalence vs the "
                         "full grid is pinned by tests/test_data.py. "
                         "Use 1 to disable (single full-grid shape)")
    args = ap.parse_args(argv)

    jax.config.update("jax_default_prng_impl", args.rng)

    from ..config import test_config
    cfg = test_config() if args.tiny else base_config()
    if args.dtype != "float32":
        cfg = cfg.replace(compute_dtype=args.dtype)
    if args.data:
        cfg = cfg.replace(data=args.data)
    if args.batch_size:
        cfg = cfg.replace(B=args.batch_size)
    logdir = args.logdir or (cfg.logdir + "-" + str(args.num))
    max_steps = args.max_steps or cfg.num_iterations

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"devices: {jax.device_count()}  mesh: {dict(mesh.shape)}")

    examples = load_dataset_index(cfg, args.features, cfg.data,
                                  on_the_fly=args.on_the_fly)
    print(f"dataset: {len(examples)} usable examples"
          + (" (on-the-fly features)" if args.on_the_fly else ""))
    buckets = None
    if args.buckets > 1:
        from ..data.dataset import compute_bucket_shapes
        buckets = compute_bucket_shapes(cfg, examples, args.features,
                                        args.buckets,
                                        on_the_fly=args.on_the_fly)
        print(f"buckets: {buckets}")
    loader = TrainLoader(cfg, examples, args.features, seed=args.seed,
                         buckets=buckets, on_the_fly=args.on_the_fly)

    key = jax.random.PRNGKey(args.seed)
    if args.num == 1:
        state = init_text2mel_state(cfg, key)
        step_fn = jax.jit(make_text2mel_step(cfg), donate_argnums=0)
    else:
        state = init_ssrn_state(cfg, key)
        step_fn = jax.jit(make_ssrn_step(cfg), donate_argnums=0)

    # Full-state resume: params + Adam moments + schedule counts, matching
    # the reference Supervisor's restore-all-globals semantics
    # (/root/reference/train.py:144). Legacy params-only checkpoints restore
    # with fast-forwarded schedule counts (see checkpoint.restore_train_state).
    params, opt_state, start_step, kind = checkpoint.restore_train_state(
        logdir, state.params, state.opt_state)
    state = state._replace(params=params, opt_state=opt_state,
                           step=jnp.asarray(start_step, jnp.int32))
    if start_step:
        print(f"resumed from step {start_step} ({kind} checkpoint)")

    from jax.sharding import NamedSharding, PartitionSpec as P
    specs = param_partition_specs(state.params, mesh)
    # commit EVERY leaf of the train state (params per TP spec, the rest
    # replicated) so the step function compiles exactly once — an
    # uncommitted leaf (e.g. the step counter) changes sharding after the
    # first step and triggers a full recompile.
    state = state._replace(
        params=jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state.params, specs),
        opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
        step=jax.device_put(state.step, NamedSharding(mesh, P())))

    logger = MetricLogger(logdir, tensorboard=args.tensorboard)
    rng = jax.random.PRNGKey(args.seed + 1)
    t_last, n_last = time.time(), start_step

    with mesh:
        # Prefetched transfers + a host-side step mirror: device_put of
        # batch k+1 overlaps step k's compute, and nothing blocks on
        # int(state.step) per iteration (that sync alone serializes the
        # whole pipeline; see parallel.mesh.prefetch_to_device).
        gs = start_step
        for batch_dev in prefetch_to_device(loader, mesh, size=2):
            if gs >= max_steps:
                break
            state, metrics = step_fn(state, batch_dev, rng)
            gs += 1  # == int(state.step) without a device sync

            if gs % args.log_every == 0:
                loss = float(metrics["loss"])
                now = time.time()
                sps = (gs - n_last) / max(now - t_last, 1e-9)
                t_last, n_last = now, gs
                logger.log(gs, {**{k: float(v) for k, v in metrics.items()},
                                "steps_per_sec": sps})
                print(f"step {gs}  loss {loss:.4f}  {sps:.2f} steps/s")

            if gs % args.ckpt_every == 0:
                # the device_get below syncs anyway; reconcile the host
                # mirror with the real counter so filenames/cutoffs can't
                # silently drift if a step variant changes the increment
                gs = int(jax.device_get(state.step))
                checkpoint.save_train_state(
                    logdir, jax.device_get(state.params),
                    jax.device_get(state.opt_state), gs,
                    keep=args.keep_ckpts)
                tag = checkpoint.step_name(gs)[9:]
                if args.num == 1:
                    # health check: alignment should converge to the diagonal
                    from .steps import teacher_forcing_shift
                    from ..models.text2mel import Text2Mel
                    from ..utils.plotting import plot_spectrogram
                    model = Text2Mel(cfg)
                    S = teacher_forcing_shift(batch_dev["mels"])
                    _, Y, align, _ = jax.jit(model.apply)(
                        state.params, batch_dev["texts"], S)
                    plot_alignment(np.asarray(align[0]), tag, logdir)
                    # image summaries, like the reference's mel_gt/mel_hat
                    # (train.py:104-105)
                    plot_spectrogram(np.asarray(batch_dev["mels"][0]),
                                     "mel_gt", tag, logdir)
                    plot_spectrogram(np.asarray(Y[0]), "mel_hat", tag, logdir)
                    logger.log_image(gs, "alignment", np.asarray(align[0]))
                    logger.log_image(gs, "mel_gt",
                                     np.asarray(batch_dev["mels"][0]).T)
                    logger.log_image(gs, "mel_hat", np.asarray(Y[0]).T)
                else:
                    from ..models.ssrn import SSRN
                    from ..utils.plotting import plot_spectrogram
                    _, Z = jax.jit(SSRN(cfg).apply)(state.params,
                                                    batch_dev["mels"])
                    plot_spectrogram(np.asarray(batch_dev["mags"][0]),
                                     "mag_gt", tag, logdir)
                    plot_spectrogram(np.asarray(Z[0]), "mag_hat", tag, logdir)
                    logger.log_image(gs, "mag_gt",
                                     np.asarray(batch_dev["mags"][0]).T)
                    logger.log_image(gs, "mag_hat", np.asarray(Z[0]).T)

    checkpoint.save_train_state(
        logdir, jax.device_get(state.params), jax.device_get(state.opt_state),
        int(state.step), keep=args.keep_ckpts)
    print("Done")


if __name__ == "__main__":
    main()
