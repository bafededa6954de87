"""Benchmark: batched Harvard-sentence synthesis throughput on one chip.

Metric (BASELINE.json): audio-seconds of speech synthesized per wall-clock
second per chip, for the full pipeline text -> Text2Mel incremental decode
(210 frames) -> SSRN -> 50-iteration Griffin-Lim -> waveform.

Baseline: the reference is TF1 on CPU with an O(T^2) full-graph recompute
per output frame and host-serial Griffin-Lim; ``scripts/cpu_baseline.py``
measures an equivalent-work CPU proxy (same math, reference decode
semantics, CPU backend) and stores it in ``baseline_cpu.json``. If that
file is absent a conservative documented estimate is used. vs_baseline =
our audio-s/s divided by the CPU reference number (target: >10).

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Conservative fallback: measured CPU proxy of the reference pipeline
# (see scripts/cpu_baseline.py); updated when the script is run.
DEFAULT_CPU_BASELINE_AUDIO_S_PER_S = 0.5


def _watchdog(seconds: float):
    """The axon TPU tunnel can wedge indefinitely if a prior process died
    mid-claim; emit an honest failure line instead of hanging forever."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "audio_seconds_per_second_per_chip",
            "value": 0.0, "unit": "audio-s/s", "vs_baseline": 0.0,
            "error": f"tpu unavailable (watchdog after {seconds:.0f}s)",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _watchdog(float(os.environ.get("BENCH_WATCHDOG_S", 1800)))
    import jax

    from dc_tts_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from dc_tts_tpu.config import base_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.pipeline import Synthesizer
    from dc_tts_tpu import text as text_mod

    cfg = base_config()
    here = os.path.dirname(os.path.abspath(__file__))
    sent_path = os.path.join(here, "harvard_sentences.txt")
    sents = text_mod.load_test_sentences(sent_path)
    # BASELINE.json config #4 is "all 720 sentences"; the reference bundles
    # only 20 (+header), so tile them to 720 — throughput is insensitive to
    # sentence content (every utterance decodes the full static grid).
    n_total = int(os.environ.get("BENCH_SENTENCES", 720))
    chunk = int(os.environ.get("BENCH_CHUNK", 72))
    reps = -(-n_total // len(sents))
    ids = text_mod.encode_batch((sents * reps)[:n_total], cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t2m_params = Text2Mel(cfg).init(k1)
    ssrn_params = SSRN(cfg).init(k2)

    # warmup/compile. NOTE: under the axon tunnel block_until_ready can
    # return before remote execution completes, so force a host copy to
    # fence the timing. Waveforms are delivered as 16-bit PCM (the standard
    # wav payload, quantized on device) — delivery is part of the metric
    # and the tunnel moves ~40 MB/s, so payload size is first-order; the
    # chunked path overlaps each chunk's transfer with the next chunk's
    # compute. If the MXU-DFT Griffin-Lim path fails to compile on this
    # backend, fall back to XLA FFT rather than reporting nothing.
    synth = None
    for method in (cfg.stft_method, "dft_mixed", "fft"):
        try:
            cfg = cfg.replace(stft_method=method)
            synth = Synthesizer(cfg, t2m_params, ssrn_params, pcm16=True)
            wavs = synth.synthesize_ids_chunked(ids[:chunk], chunk)
            break
        except Exception as e:
            if method == "fft":
                raise
            # a fallback is a DEGRADED run — say so loudly (stderr, so the
            # JSON line stays clean) instead of silently benching a slower
            # method as if it were the default
            import sys as _sys
            print(f"bench: stft_method={method!r} FAILED "
                  f"({type(e).__name__}: {str(e)[:200]}); falling back",
                  file=_sys.stderr, flush=True)
            continue

    # median of >=3 reps with spread: the headline must be what anyone
    # rerunning the driver reproduces, not a lucky min (round-2 had a 13%
    # gap between a builder-side min-of-2 and the driver's number).
    n_reps = int(os.environ.get("BENCH_REPS", 5))
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        wavs = synth.synthesize_ids_chunked(ids, chunk)
        times.append(time.perf_counter() - t0)
    n_samples = int(np.prod(wavs.shape))

    dt = float(np.median(times))
    audio_s = n_samples / cfg.sr
    value = audio_s / dt
    spread = (max(times) - min(times)) / dt if dt else 0.0

    # DEVICE-side throughput: the same full pipeline (decode -> SSRN ->
    # GL -> pcm16 quantize) fenced on a scalar reduction instead of the
    # waveform delivery. The wall metric above is bounded by ~330 MB of
    # pcm16 over the axon tunnel, whose bandwidth swings 2x run to run
    # (round-3 verdict: two consecutive rounds of >25% headline/driver
    # gaps) — this channel records compute progress independently of the
    # link. Delivery stays in the headline `value`; `value_device` is the
    # tunnel-independent companion.
    import jax.numpy as jnp
    dev_fn = jax.jit(lambda p1, p2, i, m: jnp.sum(
        synth._synth_fn(p1, p2, i, m)[0].astype(jnp.float32)))
    n_chunks = -(-ids.shape[0] // chunk)
    idsp = np.concatenate(
        [ids, np.zeros((n_chunks * chunk - ids.shape[0], ids.shape[1]),
                       ids.dtype)], axis=0)
    float(np.asarray(dev_fn(synth.t2m_params, synth.ssrn_params,
                            idsp[:chunk], synth._gl_mats)))  # compile
    dev_times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        acc = [dev_fn(synth.t2m_params, synth.ssrn_params,
                      idsp[i * chunk:(i + 1) * chunk], synth._gl_mats)
               for i in range(n_chunks)]
        _ = [float(np.asarray(a)) for a in acc]  # 4-byte fences
        dev_times.append(time.perf_counter() - t0)
    dt_dev = float(np.median(dev_times))
    value_device = audio_s / dt_dev if dt_dev else 0.0

    baseline = DEFAULT_CPU_BASELINE_AUDIO_S_PER_S
    bl_path = os.path.join(here, "baseline_cpu.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f)["audio_s_per_s"]

    watchdog.cancel()
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(value / baseline, 2),
        # delivery format is part of the metric: waveforms are quantized to
        # 16-bit PCM on device, halving the device->host payload vs float32.
        # The CPU baseline is delivery-insensitive (no device transfer; the
        # quantization itself is ~free), so vs_baseline stays comparable.
        "delivery": "pcm16",
        # device-only audio-s/s (scalar-reduction fence, no wav delivery):
        # the tunnel-bandwidth-independent compute record
        "value_device": round(value_device, 3),
        "rep_times_device_s": [round(t, 3) for t in dev_times],
        "stft_method": cfg.stft_method,
        "sentences": int(ids.shape[0]),
        "chunk": chunk,
        "reps": n_reps,
        "rep_times_s": [round(t, 3) for t in times],
        "rep_spread": round(spread, 4),
    }))


if __name__ == "__main__":
    main()
