"""Synthesis CLI: ``python -m dc_tts_tpu.synthesize``.

Mirrors the reference's UX (``/root/reference/synthesize.py``): read a
Harvard-sentences style file, restore Text2Mel from logdir-1 and SSRN from
logdir-2, synthesize every sentence, write ``<sampledir>/{i}.wav``. The
compute is one device-resident jit per batch instead of 210 host round
trips + host Griffin-Lim.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from .config import base_config
from .dsp.audio import save_wav
from .parallel.mesh import make_mesh
from .pipeline import Synthesizer
from . import text as text_mod


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batch TTS synthesis")
    ap.add_argument("--sentences", default=None,
                    help="Harvard-style sentence file (default cfg.test_data)")
    ap.add_argument("--logdir1", default=None, help="Text2Mel checkpoint dir")
    ap.add_argument("--logdir2", default=None, help="SSRN checkpoint dir")
    ap.add_argument("--out", default=None, help="output dir (cfg.sampledir)")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "fused", "incremental", "reference"],
                    help="decode path (see Text2Mel.decode); auto = the "
                         "whole-loop fused Pallas kernel, including under "
                         "--mesh (shard_mapped per device since r5)")
    ap.add_argument("--random-weights", action="store_true",
                    help="skip checkpoint restore (smoke tests)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over all devices (data parallel)")
    ap.add_argument("--pipeline", action="store_true",
                    help="pipeline-parallel synthesis over two device "
                         "submeshes: Text2Mel decode on one half, "
                         "SSRN+Griffin-Lim on the other, microbatches "
                         "streamed through (the TPU generalization of the "
                         "reference's two-GPU split, README.md:32). Needs "
                         ">=2 devices")
    ap.add_argument("--microbatch", type=int, default=8,
                    help="pipeline microbatch size (--pipeline only); the "
                         "sentence batch is padded up to a multiple")
    ap.add_argument("--time-shard", type=int, default=0, metavar="N",
                    help="sequence-parallel vocoding: shard the SSRN conv "
                         "stack and the Griffin-Lim frame axis over N "
                         "devices (halo exchanges per conv/iteration; "
                         "parallel/sp.py + sp_gl.py). The long-utterance "
                         "scaling axis — DP (--mesh) shards utterances, "
                         "this shards TIME. 0 = off; requires the frame "
                         "grid to divide by N")
    ap.add_argument("--tiny", action="store_true",
                    help="use the tiny test config (CI smoke runs)")
    ap.add_argument("--decode-precision", default="highest",
                    choices=["highest", "hybrid", "high3"],
                    help="fused decode kernel matmul mode: highest "
                         "(default — XLA parity holds unconditionally), "
                         "hybrid (enc HIGHEST / dec 3-pass, ~1.4x) or "
                         "high3 (all 3-pass, ~1.5x). The reduced modes "
                         "are for TRAINED checkpoints only: at random "
                         "init they flip the monotonic-attention cursor "
                         "(measured, scripts/decode_fused_bench.py)")
    ap.add_argument("--ssrn-precision", default="high",
                    choices=["high", "highest", "bf16"],
                    help="SSRN conv precision for synthesis: high (3-pass "
                         "f32 accumulation, default — 1.45x faster than "
                         "highest at 7e-5 output error), highest (strict "
                         "parity), bf16 (fastest, ~2%% mag noise)")
    ap.add_argument("--plots", action="store_true",
                    help="save per-utterance attention alignment plots")
    args = ap.parse_args(argv)
    if args.decode_precision != "highest" and args.mode in (
            "incremental", "reference"):
        ap.error("--decode-precision only applies to the fused decode "
                 "kernel; --mode incremental/reference always run at "
                 "HIGHEST (the flag would be silently ignored)")
    if args.pipeline and (args.mesh or args.mode != "auto" or args.plots
                          or args.decode_precision != "highest"):
        ap.error("--pipeline uses its own two-submesh layout and fixed "
                 "decode path and returns waveforms only; it cannot be "
                 "combined with --mesh, --mode, --decode-precision, or "
                 "--plots")
    if args.time_shard and (args.pipeline or args.mesh or args.plots
                            or args.mode != "auto"
                            or args.ssrn_precision != "high"
                            or args.decode_precision != "highest"):
        ap.error("--time-shard owns the whole mesh (it shards the TIME "
                 "axis, not utterances), always decodes fused at HIGHEST, "
                 "runs the time-sharded SSRN at full f32, and returns "
                 "waveforms only; it cannot be combined with --pipeline, "
                 "--mesh, --plots, --mode, --decode-precision, or "
                 "--ssrn-precision")

    from .utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from .config import test_config
    cfg = test_config() if args.tiny else base_config()
    sent_path = args.sentences or cfg.test_data
    out_dir = args.out or cfg.sampledir
    sents = text_mod.load_test_sentences(sent_path)
    print(f"{len(sents)} sentences from {sent_path}")

    mesh = make_mesh() if args.mesh else None
    if args.random_weights:
        from .models.ssrn import SSRN
        from .models.text2mel import Text2Mel
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        t2m_params = Text2Mel(cfg).init(k1)
        ssrn_params = SSRN(cfg).init(k2)
    else:
        from .pipeline import restore_synthesis_params
        t2m_params, ssrn_params = restore_synthesis_params(
            cfg, args.logdir1 or cfg.logdir + "-1",
            args.logdir2 or cfg.logdir + "-2")
    if args.pipeline:
        from .pipeline import PipelinedSynthesizer
        synth = PipelinedSynthesizer(cfg, t2m_params, ssrn_params,
                                     microbatch=args.microbatch,
                                     ssrn_precision=args.ssrn_precision)
    elif args.time_shard:
        synth = None  # functional path, see below
    else:
        synth = Synthesizer(cfg, t2m_params, ssrn_params,
                            mesh=mesh, decode_mode=args.mode,
                            ssrn_precision=args.ssrn_precision,
                            decode_prec=args.decode_precision)

    t0 = time.time()
    if args.plots:
        from . import text as _t
        from .utils.plotting import plot_alignment
        ids = _t.encode_batch(sents, cfg)
        wav_arr, _, _, align = synth.synthesize_ids(ids)
        from .dsp.features import trim_silence
        wavs = [trim_silence(w) for w in np.asarray(wav_arr)]
        os.makedirs(out_dir, exist_ok=True)
        for i, a in enumerate(np.asarray(align)):
            plot_alignment(a, f"utt{i + 1}", out_dir)
    elif args.pipeline:
        from .dsp.features import trim_silence
        ids = np.asarray(text_mod.encode_batch(sents, cfg))
        wav_arr = synth.synthesize_ids(ids)  # pads internally
        wavs = [trim_silence(w) for w in np.asarray(wav_arr)]
    elif args.time_shard:
        from .dsp.features import trim_silence
        from .pipeline import synthesize_time_sharded
        ids = np.asarray(text_mod.encode_batch(sents, cfg))
        wav_arr, _, _, _ = synthesize_time_sharded(
            cfg, t2m_params, ssrn_params, ids, n_shards=args.time_shard)
        wavs = [trim_silence(w) for w in np.asarray(wav_arr)]
    else:
        wavs = synth.synthesize(sents)
    dt = time.time() - t0
    audio_s = sum(len(w) for w in wavs) / cfg.sr
    print(f"synthesized {audio_s:.1f}s of audio in {dt:.1f}s "
          f"({audio_s / dt:.2f} audio-s/s)")

    os.makedirs(out_dir, exist_ok=True)
    for i, wav in enumerate(wavs):
        peak = np.abs(wav).max()
        if peak > 1.0:  # prevent clipping from untrained checkpoints
            wav = wav / peak
        save_wav(os.path.join(out_dir, f"{i + 1}.wav"), wav, cfg.sr)
    print(f"wrote {len(wavs)} wavs to {out_dir}")


if __name__ == "__main__":
    main()
