"""Static configuration for the TPU-native DC-TTS framework.

Mirrors every field of the reference's global config class
(``/root/reference/hyperparams.py:7-47``) — the values are load-bearing for
numerical parity — but as a frozen dataclass so that configs are hashable,
can be closed over by ``jax.jit`` as static data, and can be ``replace``d to
build tiny test configs without editing source.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    # --- signal processing (reference hyperparams.py:13-24) ---
    sr: int = 22050                # sampling rate
    n_fft: int = 2048              # FFT size (samples)
    frame_shift: float = 0.0125    # seconds
    frame_length: float = 0.05     # seconds
    n_mels: int = 80               # mel bands
    power: float = 1.5             # magnitude sharpening exponent before Griffin-Lim
    n_iter: int = 50               # Griffin-Lim iterations
    preemphasis: float = 0.97
    max_db: float = 100.0
    ref_db: float = 20.0

    # --- model (reference hyperparams.py:26-32) ---
    r: int = 4                     # reduction factor (mel frame decimation)
    dropout_rate: float = 0.05
    e: int = 128                   # embedding width
    d: int = 256                   # Text2Mel hidden width
    c: int = 512                   # SSRN hidden width
    attention_win_size: int = 3

    # --- data (reference hyperparams.py:34-40) ---
    data: str = "data/LJSpeech-1.1"
    test_data: str = "harvard_sentences.txt"
    vocab: str = "PE abcdefghijklmnopqrstuvwxyz'.?"  # P: pad, E: EOS
    max_N: int = 180               # max characters
    max_T: int = 210               # max (reduced) mel frames

    # --- training scheme (reference hyperparams.py:42-47) ---
    lr: float = 0.001
    logdir: str = "logdir/LJ01"
    sampledir: str = "samples"
    B: int = 32                    # global batch size
    num_iterations: int = 2_000_000
    warmup_steps: float = 4000.0   # Noam warmup (reference utils.py:142-145)

    # --- numerics / TPU-specific knobs (new; no reference counterpart) ---
    # Layer-norm epsilon. tf.contrib.layers.layer_norm uses 1e-12; we default
    # to 1e-5 because the teacher-forced zero frame (train.py:51) produces an
    # exactly-zero-variance column in every causal layer, and eps=1e-12 makes
    # the stacked LN Jacobians overflow fp32 during backprop (the TF graph
    # "survives" only because clip_by_value maps the resulting infs to +-1).
    # Set 1e-12 for strict forward parity against converted TF weights.
    ln_eps: float = 1e-5
    # STFT/iSTFT backend for the Griffin-Lim loop: "dft" runs the real DFT
    # as cos/sin matmuls on the MXU at full f32 precision (faster than
    # XLA's TPU FFT at n_fft=2048, see dsp/stft.py); "dft_3x" uses 3-pass
    # bf16 accumulation (~f32 quality: rel err ~1e-7 per transform,
    # identical to "dft" on CPU); "dft_mixed" runs bf16 phase-estimation
    # rounds with a 3-pass finish (quality pinned equal to dft_3x,
    # tests/test_dsp.py); "ct" is the Cooley-Tukey factored DFT (128-point
    # MXU stage + N2-point VPU stage, ~8x fewer matmul FLOPs at
    # n_fft=2048, ~3e-7 rel err vs fft); "dft_bf16" is single-pass bf16
    # (bounded quality loss, opt-in); "fft" uses jnp.fft; "dft_pallas"
    # is dft_mixed's schedule with the bf16 middle rounds
    # FUSED into two Pallas kernels that keep each istft->stft round's
    # intermediates in VMEM (ops/pallas_gl.py) — measured 5.8 vs 12.8
    # ms/round against the XLA bf16 loop on v5e, 424 vs 684 ms for the
    # full 50-iteration GL at B=40 (scripts/gl_pallas_bench.py); quality
    # pinned equal to dft_mixed (tests/test_pallas_gl.py). "dft_pallas2"
    # (the default) goes further: the ENTIRE n_iter-round loop is ONE
    # Pallas kernel per utterance — spectrum, waveform, frame buffer and
    # the tiny factored-DFT (Cooley-Tukey 16x128) constants stay
    # VMEM-resident across all rounds, magnitude read once, waveform
    # written once (ops/pallas_gl2.py) — measured 201 vs 333 ms for the
    # full 50-iteration GL at B=40 on v5e; quality pinned equal to
    # dft_mixed (tests/test_pallas_gl2.py). Off-TPU the
    # fused kernels run in Pallas interpret mode (same math). Round-2
    # numbers for the others (BASELINE.md): fft 193, dft 205, ct 241,
    # dft_3x 281, dft_bf16 351 audio-s/s.
    stft_method: str = "dft_pallas2"
    # rematerialize block activations in backprop (memory for FLOPs)
    remat: bool = False
    compute_dtype: str = "float32"  # activations dtype under jit
    # EXPERIMENTAL: route HC TRAINING through the hand-written Pallas
    # custom-VJP kernel (ops/pallas_hc_vjp.py) where it fits VMEM. The
    # production synthesis fast paths (fused decode loop, fused GL) are
    # always-on and NOT gated by this flag.
    use_pallas: bool = False

    # ------------------------------------------------------------------
    @property
    def hop_length(self) -> int:
        """Samples per hop. == 275 at base config — int(22050*0.0125); the
        reference's source comment claims "=276" but its runtime value is
        275 (hyperparams.py:18)."""
        return int(self.sr * self.frame_shift)

    @property
    def win_length(self) -> int:
        """Window length in samples. == 1102 at base config (hyperparams.py:19)."""
        return int(self.sr * self.frame_length)

    @property
    def n_freq(self) -> int:
        """rfft bin count: 1 + n_fft // 2."""
        return 1 + self.n_fft // 2

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def max_T_full(self) -> int:
        """Full-resolution spectrogram frames: max_T * r."""
        return self.max_T * self.r

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def base_config() -> Config:
    """The reference's exact configuration (LJSpeech)."""
    return Config()


def test_config() -> Config:
    """A tiny config for fast CPU tests: same structure, small dims.

    Keeps r=4 and the kernel/dilation structure meaningful (max_T must be
    large enough for the dilated receptive fields to be exercised).
    """
    return Config(
        sr=8000,
        n_fft=256,
        frame_shift=8 / 8000.0,    # hop 8
        frame_length=32 / 8000.0,  # win 32
        n_mels=12,
        n_iter=4,
        e=16,
        d=32,
        c=48,
        max_N=20,
        max_T=24,
        B=2,
        dropout_rate=0.0,
    )


# keep pytest from collecting the factory as a test when imported by name
test_config.__test__ = False  # type: ignore[attr-defined]
