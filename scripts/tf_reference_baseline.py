"""Time the REFERENCE implementation itself on CPU (baseline provenance).

Round-1 shipped a conservative CPU *proxy* (scripts/cpu_baseline.py: our
JAX implementation run with reference decode semantics on the CPU
backend). This script upgrades the provenance: it executes the
reference's OWN graph code (/root/reference/train.py Graph via the TF1
shim from tf_oracle_export.py) at full production hyperparams and times
the exact synthesize.py:45-57 procedure:

  1. 210 autoregressive steps, each a sess.run of the FULL graph
  2. one SSRN pass (mel -> linear magnitude)
  3. spectrogram2wav per utterance (utils.py:96-114): mag**1.5, 50
     Griffin-Lim iterations, de-preemphasis lfilter

librosa is not installed in this image, so step 3 uses a numpy
transcription of librosa.stft/istft semantics (center/reflect pad, hann
window zero-centered in the n_fft buffer, NOLA-normalized overlap-add)
running on numpy's pocketfft — the same backend librosa itself uses, so
the timing is representative and slightly favorable to the reference
(no librosa framing overhead).

Writes baseline_cpu.json consumed by bench.py.

    python scripts/tf_reference_baseline.py [--batch N] [--json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np
from scipy import signal as sp_signal

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REFERENCE = "/root/reference"

sys.path.insert(0, HERE)
from tf_oracle_export import install_tf1_shim  # noqa: E402


# ---------------------------------------------------------------------------
# numpy transcription of the librosa calls in reference utils.py:96-114


def _hann_padded(win_length: int, n_fft: int) -> np.ndarray:
    # scipy.signal.get_window("hann", win, fftbins=True), zero-padded and
    # centered in an n_fft buffer — librosa.filters.get_window + util.pad_center
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    out = np.zeros(n_fft)
    lo = (n_fft - win_length) // 2
    out[lo:lo + win_length] = w
    return out


def np_stft(y: np.ndarray, n_fft: int, hop: int, win_length: int
            ) -> np.ndarray:
    """librosa.stft(y, n_fft, hop, win_length): center/reflect pad,
    windowed frames, rfft; returns (1+n_fft//2, T)."""
    w = _hann_padded(win_length, n_fft)
    ypad = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(ypad) - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = ypad[idx] * w[None, :]
    return np.fft.rfft(frames, axis=1).T


def np_istft(S: np.ndarray, hop: int, win_length: int) -> np.ndarray:
    """librosa.istft(S, hop, win_length, window='hann'): irfft per frame,
    synthesis window, NOLA-normalized overlap-add, center-trim."""
    n_fft = 2 * (S.shape[0] - 1)
    w = _hann_padded(win_length, n_fft)
    frames = np.fft.irfft(S.T, n=n_fft, axis=1) * w[None, :]
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    out = np.zeros(out_len)
    wsum = np.zeros(out_len)
    w2 = w * w
    for i in range(n_frames):
        s = i * hop
        out[s:s + n_fft] += frames[i]
        wsum[s:s + n_fft] += w2
    nz = wsum > np.finfo(np.float64).tiny
    out[nz] /= wsum[nz]
    return out[n_fft // 2: out_len - n_fft // 2]


def spectrogram2wav_np(mag: np.ndarray, hp) -> np.ndarray:
    """Reference utils.spectrogram2wav with the librosa calls transcribed
    (utils.py:66-93; trim omitted — the throughput metric counts
    untrimmed samples on both sides)."""
    mag = mag.T
    mag = (np.clip(mag, 0, 1) * hp.max_db) - hp.max_db + hp.ref_db
    mag = np.power(10.0, mag * 0.05)
    X = (mag ** hp.power).astype(np.complex128)
    spectro = np.abs(X)
    for _ in range(hp.n_iter):
        xt = np_istft(X, hp.hop_length, hp.win_length)
        est = np_stft(xt, hp.n_fft, hp.hop_length, hp.win_length)
        tmin = min(est.shape[1], spectro.shape[1])
        phase = est[:, :tmin] / np.maximum(1e-8, np.abs(est[:, :tmin]))
        X = spectro[:, :tmin] * phase
        spectro = spectro[:, :tmin]
    wav = np_istft(X, hp.hop_length, hp.win_length)
    return sp_signal.lfilter([1], [1, -hp.preemphasis], wav)


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20,
                    help="sentences (reference bundles 20)")
    ap.add_argument("--json", action="store_true",
                    help="write baseline_cpu.json")
    args = ap.parse_args()

    v1 = install_tf1_shim()
    sys.modules["librosa"] = types.ModuleType("librosa")
    sys.path.insert(0, REFERENCE)
    import hyperparams  # noqa: E402
    hp = hyperparams.Hyperparams
    import data_load  # noqa: E402
    import train as ref_train  # noqa: E402

    os.chdir(REFERENCE)  # hp.test_data is a relative path
    L = data_load.load_data("synthesize")[:args.batch]
    B = L.shape[0]
    print(f"reference synthesize path, TF {sys.modules['tensorflow'].__version__ if hasattr(sys.modules['tensorflow'], '__version__') else 'v1-compat'}, "
          f"B={B}, max_N={hp.max_N}, max_T={hp.max_T}", flush=True)

    g1 = v1.Graph()
    with g1.as_default():
        v1.set_random_seed(0)
        g = ref_train.Graph(mode="synthesize")
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            # warm one full-graph run (TF kernel init, thread pools)
            Y = np.zeros((B, hp.max_T, hp.n_mels), np.float32)
            pma = np.zeros((B,), np.int32)
            sess.run([g.Y, g.max_attentions],
                     {g.L: L, g.mels: Y, g.prev_max_attentions: pma})

            t0 = time.perf_counter()
            for j in range(hp.max_T):
                _Y, _max_att = sess.run(
                    [g.Y, g.max_attentions],
                    {g.L: L, g.mels: Y, g.prev_max_attentions: pma})
                Y[:, j, :] = _Y[:, j, :]
                pma = _max_att[:, j]
            t_decode = time.perf_counter() - t0
            print(f"text2mel loop ({hp.max_T} full-graph steps): "
                  f"{t_decode:.1f}s", flush=True)

            t0 = time.perf_counter()
            Z = sess.run(g.Z, {g.Y: Y})
            t_ssrn = time.perf_counter() - t0
            print(f"ssrn: {t_ssrn:.1f}s", flush=True)

    t0 = time.perf_counter()
    n_samples = 0
    for b in range(B):
        wav = spectrogram2wav_np(Z[b], hp)
        n_samples += len(wav)
    t_voc = time.perf_counter() - t0
    print(f"griffin-lim x{hp.n_iter} vocoder ({B} utts): {t_voc:.1f}s",
          flush=True)

    total = t_decode + t_ssrn + t_voc
    audio_s = n_samples / hp.sr
    value = audio_s / total
    print(f"total {total:.1f}s for {audio_s:.1f} audio-s -> "
          f"{value:.3f} audio-s/s", flush=True)

    if args.json:
        path = os.path.join(REPO, "baseline_cpu.json")
        with open(path, "w") as f:
            json.dump({
                "audio_s_per_s": round(value, 4),
                "batch": B,
                "mode": "tf-reference (real /root/reference graph via TF1 "
                        "shim; vocoder = numpy transcription of its librosa "
                        "calls; untrimmed samples)",
                "seconds": round(total, 2),
                "decode_s": round(t_decode, 2),
                "ssrn_s": round(t_ssrn, 2),
                "vocoder_s": round(t_voc, 2),
                "proxy_round1_audio_s_per_s": 4.6357,
            }, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
