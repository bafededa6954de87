"""Profiling / tracing helpers (SURVEY §5: the reference has none).

``trace(logdir)`` wraps a code region in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``time_fn`` benchmarks a jitted callable with
host-copy fencing (the axon tunnel's ``block_until_ready`` can return
before remote execution finishes, so a device→host copy is the only
reliable fence); ``flops_estimate`` gives roofline denominators for the
core ops.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 3, warmup: int = 1) -> float:
    """Best wall time of fn(*args) with full host fencing. Returns seconds."""
    for _ in range(warmup):
        jax.tree.map(np.asarray, fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def conv_stack_flops(batch: int, t: int, specs, in_ch: int) -> int:
    """Forward FLOPs of a C/HC/D stack (2*M*N*K per matmul)."""
    from ..models.blocks import C, D, HC, stack_in_channels
    total = 0
    chs = stack_in_channels(specs, in_ch)
    tt = t
    for spec, cin in zip(specs, chs):
        if isinstance(spec, HC):
            total += 2 * batch * tt * (spec.size * cin) * (2 * cin)
        elif isinstance(spec, C):
            cout = spec.out_ch or cin
            total += 2 * batch * tt * (spec.size * cin) * cout
        elif isinstance(spec, D):
            cout = spec.out_ch or cin
            total += 2 * batch * tt * cin * cout * 3
            tt *= 2
    return total


def griffin_lim_flops(batch: int, frames: int, n_fft: int, n_iter: int,
                      method: str = "dft") -> int:
    """Matmul FLOPs of the Griffin-Lim loop for a given STFT backend.

    dft*-family: 4 real matmuls (fwd cos/sin + inv cos/sin) per iteration.
    "ct" factors the DFT into a 128-point MXU stage + N2-point VPU stage —
    ~(n_fft/256)x fewer matmul FLOPs (8x at n_fft=2048) plus the VPU
    multiply-reduce, counted here as its MAC count. "fft" is O(N log N),
    counted as 5*N*log2(N) per transform (the standard FFT cost model).
    """
    n_freq = n_fft // 2 + 1
    if method == "fft":
        import math
        per_tf = 5 * n_fft * math.log2(n_fft) * batch * frames
        return int((n_iter + 1) * 2 * per_tf)
    if method == "ct":
        n1 = 128
        n2 = n_fft // n1
        mxu = 2 * batch * frames * n2 * n1 * n1 * 2      # cos+sin stage
        vpu = 2 * batch * frames * n2 * n2 * n1 * 2      # twiddle reduce
        return (n_iter + 1) * (mxu + vpu) * 2            # fwd + inv
    if method == "dft_pallas2":
        # whole-loop fused kernel, 4-step factored DFT over the FULL
        # 2048-bin spectrum (ops/pallas_gl2.py): per frame per direction,
        # a stacked (32,16)@(16,n_fft) 16-point stage + 4 real
        # (n_fft/128-grouped) 128-point matmuls + an elementwise twiddle
        n1, n2 = 16, n_fft // 16
        stage16 = 2 * n1 * n1 * n_fft * 2            # [C;S] @ x
        stage128 = 4 * n1 * n2 * n2 * 2              # complex 128-stage
        per_dir = batch * frames * (stage16 + stage128)
        return (n_iter + 1) * per_dir * 2
    per_dir = 2 * batch * frames * n_fft * n_freq * 2    # cos+sin
    return (n_iter + 1) * per_dir * 2                    # fwd + inv


# bf16 matmul peak of one TPU v5e (lite) chip; f32 matmuls at
# Precision.HIGHEST cost ~6 bf16 passes, HIGH ("3x") ~3 passes.
V5E_BF16_PEAK_FLOPS = 197e12

# MXU passes per algorithmic FLOP for each matmul precision mode
PRECISION_PASSES = {"f32_highest": 6, "f32_high": 3, "bf16": 1}


def mfu(flops: int, seconds: float, passes: int = 1,
        peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    """Model FLOPs utilization: algorithmic FLOPs (x MXU pass multiplier
    for the precision mode) over peak. In [0, 1]."""
    return flops * passes / (seconds * peak)
