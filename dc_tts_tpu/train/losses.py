"""Training losses for Text2Mel and SSRN.

Loss contract from the reference (``/root/reference/train.py:85-113``):

Text2Mel:  L = mean|Y - mels|                                (L1)
             + mean sigmoid_xent(Y_logits, mels)             ("binary divergence")
             + sum(|A * W| * mask) / sum(mask)               (guided attention)
SSRN:      L = mean|Z - mags| + mean sigmoid_xent(Z_logits, mags)

The guided-attention weight W[n, t] = 1 - exp(-(t/max_T - n/max_N)^2 / 2g^2)
with g = 0.2 (utils.py:134-140). The reference's pad(-1)-then-crop trick
(train.py:91-95) exists because its batches are dynamically padded to the
bucket max — the mask marks "real" (n, t) cells. On TPU shapes are static
(max_N, max_T), so the mask is built directly from per-example lengths,
which reproduces the reference's semantics for equivalent batches.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


@functools.lru_cache(maxsize=4)
def guided_attention_matrix(max_n: int, max_t: int, g: float = 0.2) -> np.ndarray:
    """(max_N, max_T) guided-attention prior, computed once on host."""
    n = np.arange(max_n)[:, None] / float(max_n)
    t = np.arange(max_t)[None, :] / float(max_t)
    return (1.0 - np.exp(-((t - n) ** 2) / (2.0 * g * g))).astype(np.float32)


def binary_divergence(logits, targets):
    """mean sigmoid cross-entropy, identical to
    tf.nn.sigmoid_cross_entropy_with_logits: max(l,0) - l*z + log1p(exp(-|l|))."""
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def attention_loss(alignments, text_lens: Optional[jax.Array],
                   mel_lens: Optional[jax.Array], cfg: Config):
    """Guided-attention loss over the real (n, t) region of each example.

    alignments: (B, N, T). With lens None the whole static grid counts —
    exactly what the reference computes when a batch is padded to
    (max_N, max_T).
    """
    B, N, T = alignments.shape
    W = jnp.asarray(guided_attention_matrix(cfg.max_N, cfg.max_T))[:N, :T]
    weighted = jnp.abs(alignments * W[None])
    if text_lens is None or mel_lens is None:
        return jnp.mean(weighted)
    n_mask = (jnp.arange(N)[None, :] < text_lens[:, None])      # (B, N)
    t_mask = (jnp.arange(T)[None, :] < mel_lens[:, None])       # (B, T)
    mask = n_mask[:, :, None] & t_mask[:, None, :]              # (B, N, T)
    total = jnp.sum(weighted * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def text2mel_loss(logits, Y, alignments, mels, cfg: Config,
                  text_lens=None, mel_lens=None):
    """Returns (loss, dict of components). Mirrors train.py:85-98."""
    loss_mels = l1_loss(Y, mels)
    loss_bd1 = binary_divergence(logits, mels)
    loss_att = attention_loss(alignments, text_lens, mel_lens, cfg)
    loss = loss_mels + loss_bd1 + loss_att
    return loss, {"loss": loss, "loss_mels": loss_mels,
                  "loss_bd1": loss_bd1, "loss_att": loss_att}


def attention_diagonality(alignments, text_lens=None, mel_lens=None):
    """Health metric: mean |n/N - t/T| distance of attention mass from the
    diagonal, in [0, 1); lower = more monotonic-diagonal. The quantitative
    stand-in for the reference's eyeballed alignment plots (README "check
    attention")."""
    B, N, T = alignments.shape
    n_len = text_lens[:, None, None] if text_lens is not None else N
    t_len = mel_lens[:, None, None] if mel_lens is not None else T
    n_pos = jnp.arange(N)[None, :, None] / n_len
    t_pos = jnp.arange(T)[None, None, :] / t_len
    dist = jnp.abs(n_pos - t_pos)
    return jnp.sum(alignments * dist) / jnp.maximum(jnp.sum(alignments), 1e-9)


def ssrn_loss(logits, Z, mags, cfg: Config):
    """Returns (loss, dict of components). Mirrors train.py:107-113."""
    loss_mags = l1_loss(Z, mags)
    loss_bd2 = binary_divergence(logits, mags)
    loss = loss_mags + loss_bd2
    return loss, {"loss": loss, "loss_mags": loss_mags, "loss_bd2": loss_bd2}
