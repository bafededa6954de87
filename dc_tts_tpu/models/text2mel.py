"""Text2Mel: TextEnc + AudioEnc + Attention + AudioDec.

Architecture contract from the reference (``/root/reference/networks.py``):

* TextEnc (networks.py:14-71): embed(e) -> C(2d,1,relu) -> C(2d,1) ->
  2x[HC(3, 3^j) j=0..3] -> 2x HC(3,1) -> 2x HC(1,1); split last axis -> K, V
  each (B, N, d). Non-causal.
* AudioEnc (networks.py:73-124): C(d,1,relu) -> C(d,1,relu) -> C(d,1) ->
  2x[HC(3, 3^j) j=0..3] -> 2x HC(3,3). All causal.
* Attention (networks.py:126-155): A = softmax(Q K^T / sqrt(d)) with an
  optional forcibly-monotonic window mask at inference; R = [A V; Q].
* AudioDec (networks.py:157-212): C(d,1) -> HC(3,3^j) j=0..3 -> 2x HC(3,1)
  -> 3x C(d,1,relu) -> C(n_mels,1) -> sigmoid. All causal.

Execution modes:
- ``apply(...)``: full-sequence teacher-forced forward (training), one jit.
- ``decode_step / make state``: incremental synthesis — AudioEnc and
  AudioDec advance one frame with cached conv history; attention computes a
  single query row with the monotonic window carried as a cursor. The
  reference instead re-runs the whole graph per output frame
  (synthesize.py:45-54); the two are equivalent because every decoder-side
  block is causal (see the decode-equivalence tests in
  tests/test_networks.py for the proof-by-test).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import layers as L
from .blocks import C, HC, apply_stack, init_stack, init_stack_state, \
    stack_in_channels, step_stack

NEG_INF = -(2.0 ** 32 - 1.0)  # the reference's mask constant (networks.py:146)


def text_enc_specs(cfg: Config):
    d = cfg.d
    specs = [C(1, 1, 2 * d, "relu"), C(1, 1, None, None)]
    specs += [HC(3, 3 ** j) for _ in range(2) for j in range(4)]
    specs += [HC(3, 1), HC(3, 1)]
    specs += [HC(1, 1), HC(1, 1)]
    return tuple(specs)


def audio_enc_specs(cfg: Config):
    d = cfg.d
    specs = [C(1, 1, d, "relu", True), C(1, 1, None, "relu", True),
             C(1, 1, None, None, True)]
    specs += [HC(3, 3 ** j, True) for _ in range(2) for j in range(4)]
    specs += [HC(3, 3, True), HC(3, 3, True)]
    return tuple(specs)


def audio_dec_specs(cfg: Config):
    d = cfg.d
    specs = [C(1, 1, d, None, True)]
    specs += [HC(3, 3 ** j, True) for j in range(4)]
    specs += [HC(3, 1, True), HC(3, 1, True)]
    specs += [C(1, 1, None, "relu", True)] * 3
    specs += [C(1, 1, cfg.n_mels, None, True)]
    return tuple(specs)


class DecodeState(NamedTuple):
    """Carried through the autoregressive loop (all device-resident)."""
    enc_bufs: tuple          # AudioEnc per-layer history buffers
    dec_bufs: tuple          # AudioDec per-layer history buffers
    prev_max_attention: jax.Array  # (B,) int32 attention cursor
    prev_y: jax.Array        # (B, n_mels) last emitted mel frame


@dataclass(frozen=True)
class Text2Mel:
    cfg: Config

    @property
    def dtype(self):
        """Matmul operand mode: bf16 operands, "high" (f32 operands at
        3-pass Precision.HIGH), or None (f32 HIGHEST)."""
        if self.cfg.compute_dtype in ("bfloat16", "bfloat16_full"):
            return jnp.bfloat16
        if self.cfg.compute_dtype == "float32_high":
            return "high"
        return None

    @property
    def act_dtype(self):
        """Inter-block activation dtype ("bfloat16_full" mode; see
        blocks.apply_stack). Stack OUTPUTS (K/V/Q/logits) are cast back to
        f32 so the attention einsums and losses keep f32 math."""
        return (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16_full"
                else None)

    # ------------------------------------------------------------- init
    def init(self, key) -> dict:
        cfg = self.cfg
        k_emb, k_t, k_a, k_d = jax.random.split(key, 4)
        params = {"embed": L.init_embedding(k_emb, cfg.vocab_size, cfg.e)}
        params["text_enc"], out = init_stack(k_t, cfg.e, text_enc_specs(cfg))
        assert out == 2 * cfg.d
        params["audio_enc"], out = init_stack(k_a, cfg.n_mels,
                                              audio_enc_specs(cfg))
        assert out == cfg.d
        params["audio_dec"], out = init_stack(k_d, 2 * cfg.d,
                                              audio_dec_specs(cfg))
        assert out == cfg.n_mels
        return params

    # ------------------------------------------------------------- encoders
    def text_encode(self, params, ids, *, rng=None, train=False
                    ) -> Tuple[jax.Array, jax.Array]:
        """ids (B, N) -> K, V each (B, N, d)."""
        cfg = self.cfg
        x = L.embedding_lookup(params["embed"], ids)
        x = apply_stack(params["text_enc"], text_enc_specs(cfg), x,
                        ln_eps=cfg.ln_eps, dropout_rate=cfg.dropout_rate,
                        rng=rng, train=train,
                        dtype=self.dtype, remat=cfg.remat,
                        use_pallas=cfg.use_pallas, act_dtype=self.act_dtype)
        return jnp.split(x.astype(jnp.float32), 2, axis=-1)

    def audio_encode(self, params, S, *, rng=None, train=False) -> jax.Array:
        """Shifted mel S (B, T/r, n_mels) -> queries Q (B, T/r, d)."""
        cfg = self.cfg
        return apply_stack(params["audio_enc"], audio_enc_specs(cfg), S,
                           ln_eps=cfg.ln_eps, dropout_rate=cfg.dropout_rate,
                           rng=rng, train=train,
                           dtype=self.dtype, remat=cfg.remat,
                           use_pallas=cfg.use_pallas,
                           act_dtype=self.act_dtype).astype(jnp.float32)

    def audio_decode(self, params, R, *, rng=None, train=False) -> jax.Array:
        """R (B, T/r, 2d) -> mel logits (B, T/r, n_mels)."""
        cfg = self.cfg
        return apply_stack(params["audio_dec"], audio_dec_specs(cfg), R,
                           ln_eps=cfg.ln_eps, dropout_rate=cfg.dropout_rate,
                           rng=rng, train=train,
                           dtype=self.dtype, remat=cfg.remat,
                           use_pallas=cfg.use_pallas,
                           act_dtype=self.act_dtype).astype(jnp.float32)

    # ------------------------------------------------------------- attention
    def attention(self, params, Q, Kt, V, *, monotonic=False,
                  prev_max_attentions=None):
        """Scaled dot-product attention over text positions.

        Q (B,T,d), Kt/V (B,N,d) -> R (B,T,2d), alignments (B,N,T),
        max_attentions (B,T). With monotonic=True, queries may only attend
        to keys in [prev, prev + attention_win_size) — the same window the
        reference builds from two sequence_masks (networks.py:141-147).
        In the full-sequence form the SAME cursor is applied to every query
        row, as in the reference graph (it only consumes one row per step).
        """
        cfg = self.cfg
        A = jnp.einsum("btd,bnd->btn", Q, Kt,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        A = A * jax.lax.rsqrt(jnp.float32(cfg.d))
        if monotonic:
            n = Kt.shape[1]
            pos = jnp.arange(n)[None, :]                      # (1, N)
            p = prev_max_attentions[:, None]                  # (B, 1)
            disallowed = (pos < p) | (pos >= p + cfg.attention_win_size)
            A = jnp.where(disallowed[:, None, :], NEG_INF, A)
        A = jax.nn.softmax(A, axis=-1)
        max_attentions = jnp.argmax(A, axis=-1)               # (B, T)
        Rctx = jnp.einsum("btn,bnd->btd", A, V,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        R = jnp.concatenate([Rctx, Q], axis=-1)
        alignments = jnp.transpose(A, (0, 2, 1))              # (B, N, T)
        return R, alignments, max_attentions

    # ------------------------------------------------------------- training fwd
    def apply(self, params, ids, S, *, rng=None, train=False,
              monotonic=False, prev_max_attentions=None):
        """Full teacher-forced forward.

        ids (B,N) int32, S (B,T,n_mels) shifted mels ->
        (Y_logits, Y, alignments, max_attentions).
        Mirrors the reference graph wiring (train.py:48-68).
        """
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        K, V = self.text_encode(params, ids, rng=rngs[0], train=train)
        Q = self.audio_encode(params, S, rng=rngs[1], train=train)
        R, alignments, max_attentions = self.attention(
            params, Q, K, V, monotonic=monotonic,
            prev_max_attentions=prev_max_attentions)
        logits = self.audio_decode(params, R, rng=rngs[2], train=train)
        return logits, jax.nn.sigmoid(logits), alignments, max_attentions

    # ------------------------------------------------------------- decode
    def init_decode_state(self, batch: int, max_t: Optional[int] = None
                          ) -> DecodeState:
        cfg = self.cfg
        max_t = max_t or cfg.max_T
        enc_specs, dec_specs = audio_enc_specs(cfg), audio_dec_specs(cfg)
        enc_bufs = init_stack_state(enc_specs,
                                    stack_in_channels(enc_specs, cfg.n_mels),
                                    batch, max_t)
        dec_bufs = init_stack_state(dec_specs,
                                    stack_in_channels(dec_specs, 2 * cfg.d),
                                    batch, max_t)
        return DecodeState(tuple(enc_bufs), tuple(dec_bufs),
                           jnp.zeros((batch,), jnp.int32),
                           jnp.zeros((batch, cfg.n_mels), jnp.float32))

    def decode_step(self, params, Kt, V, state: DecodeState, t
                    ) -> Tuple[jax.Array, jax.Array, DecodeState]:
        """Advance the autoregressive decoder by one frame.

        Consumes state.prev_y as the teacher-forcing input (S_t = Y_{t-1},
        zero at t=0 — the shift from train.py:51), runs one causal step of
        AudioEnc, one monotonic-window attention row, one causal step of
        AudioDec. Returns (y_t (B,n_mels), align_t (B,N), new_state).
        """
        cfg = self.cfg
        s_t = state.prev_y  # (B, n_mels); initialized to zeros for t=0
        q_t, enc_bufs = step_stack(params["audio_enc"], audio_enc_specs(cfg),
                                   s_t, list(state.enc_bufs), t,
                                   ln_eps=cfg.ln_eps)
        # single-query attention row (the whole-loop fused decode kernel,
        # ops/pallas_decode.py, is the production fast path; a per-step
        # Pallas attention kernel was measured slower and retired r4)
        a = jnp.einsum("bd,bnd->bn", q_t, Kt,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        a = a * jax.lax.rsqrt(jnp.float32(cfg.d))
        n = Kt.shape[1]
        pos = jnp.arange(n)[None, :]
        p = state.prev_max_attention[:, None]
        disallowed = (pos < p) | (pos >= p + cfg.attention_win_size)
        a = jnp.where(disallowed, NEG_INF, a)
        a = jax.nn.softmax(a, axis=-1)                  # (B, N)
        new_p = jnp.argmax(a, axis=-1).astype(jnp.int32)
        r_t = jnp.einsum("bn,bnd->bd", a, V,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        r_t = jnp.concatenate([r_t, q_t], axis=-1)      # (B, 2d)

        logits_t, dec_bufs = step_stack(params["audio_dec"],
                                        audio_dec_specs(cfg), r_t,
                                        list(state.dec_bufs), t,
                                        ln_eps=cfg.ln_eps)
        y_t = jax.nn.sigmoid(logits_t)
        new_state = DecodeState(tuple(enc_bufs), tuple(dec_bufs), new_p, y_t)
        return y_t, a, new_state

    def decode(self, params, ids, max_t: Optional[int] = None, *,
               mode: str = "incremental",
               prec: str = "highest") -> Tuple[jax.Array, jax.Array]:
        """Full autoregressive synthesis of ids (B,N) -> (Y, alignments).

        Y (B, max_T, n_mels); alignments (B, N, max_T). Device-resident
        lax.fori_loop — one jit, no host round trips.

        mode="incremental" (default): O(T) decode — every stage advances one
        frame with cached causal-conv state; each attention row is masked by
        the cursor of ITS OWN step. This is the paper's forcibly-incremental
        attention and the fast path.

        mode="reference": bit-faithful to the reference's recompute loop
        (synthesize.py:45-54), whose subtlety is that at step j the CURRENT
        cursor's window re-masks every EARLIER query column too, and those
        re-masked rows feed the causal AudioDec history for frame j. Exact
        parity therefore requires recomputing attention + AudioDec over the
        full prefix each step — O(T^2), still device-resident. Q columns ARE
        cached incrementally (AudioEnc never sees the mask, so they are
        step-invariant). Use for golden/parity checks against TF.
        """
        if mode == "incremental":
            return self._decode_incremental(params, ids, max_t)
        if mode == "fused":
            return self._decode_fused(params, ids, max_t, prec=prec)
        if mode == "reference":
            return self._decode_reference(params, ids, max_t)
        raise ValueError(f"unknown decode mode {mode!r}")

    def _decode_fused(self, params, ids, max_t=None, prec="highest"):
        """mode="fused": the whole 210-step loop as ONE Pallas kernel with
        VMEM-resident weights and shift-register conv state
        (ops/pallas_decode.py) — same semantics as "incremental", f32
        matmuls, parity pinned by tests/test_pallas_decode.py."""
        import jax as _jax

        from ..ops.pallas_decode import fused_decode, pack_decode_params
        cfg = self.cfg
        max_t = max_t or cfg.max_T
        Kt, V = self.text_encode(params, ids, train=False)
        packed = pack_decode_params(cfg, params)
        interpret = _jax.default_backend() != "tpu"
        return fused_decode(packed, Kt, V, max_t, cfg, interpret=interpret,
                            prec=prec)

    def _decode_incremental(self, params, ids, max_t=None):
        cfg = self.cfg
        max_t = max_t or cfg.max_T
        B = ids.shape[0]
        Kt, V = self.text_encode(params, ids, train=False)
        state = self.init_decode_state(B, max_t)
        Y = jnp.zeros((B, max_t, cfg.n_mels), jnp.float32)
        A = jnp.zeros((B, max_t, ids.shape[1]), jnp.float32)

        def body(t, carry):
            Y, A, state = carry
            y_t, a_t, state = self.decode_step(params, Kt, V, state, t)
            Y = jax.lax.dynamic_update_slice(Y, y_t[:, None, :], (0, t, 0))
            A = jax.lax.dynamic_update_slice(A, a_t[:, None, :], (0, t, 0))
            return Y, A, state

        Y, A, state = jax.lax.fori_loop(0, max_t, body, (Y, A, state))
        return Y, jnp.transpose(A, (0, 2, 1))

    def _decode_reference(self, params, ids, max_t=None):
        cfg = self.cfg
        max_t = max_t or cfg.max_T
        B = ids.shape[0]
        Kt, V = self.text_encode(params, ids, train=False)
        enc_specs = audio_enc_specs(cfg)
        enc_bufs = init_stack_state(enc_specs,
                                    stack_in_channels(enc_specs, cfg.n_mels),
                                    B, max_t)
        Y = jnp.zeros((B, max_t, cfg.n_mels), jnp.float32)
        Q = jnp.zeros((B, max_t, cfg.d), jnp.float32)
        A_out = jnp.zeros((B, max_t, ids.shape[1]), jnp.float32)
        prev = jnp.zeros((B,), jnp.int32)
        prev_y = jnp.zeros((B, cfg.n_mels), jnp.float32)

        def body(t, carry):
            Y, Q, A_out, prev, prev_y, enc_bufs = carry
            q_t, enc_bufs = step_stack(params["audio_enc"], enc_specs,
                                       prev_y, enc_bufs, t, ln_eps=cfg.ln_eps)
            Q = jax.lax.dynamic_update_slice(Q, q_t[:, None, :], (0, t, 0))
            # Full-prefix attention + decoder under the CURRENT cursor mask,
            # exactly like the reference's per-step full-graph run. Columns
            # > t of Q are zeros, but AudioDec is causal so column t never
            # sees them.
            R, align, maxatt = self.attention(params, Q, Kt, V,
                                              monotonic=True,
                                              prev_max_attentions=prev)
            logits = self.audio_decode(params, R)
            y_t = jax.nn.sigmoid(
                jax.lax.dynamic_slice(logits, (0, t, 0),
                                      (B, 1, cfg.n_mels)))[:, 0]
            align_tn = jnp.transpose(align, (0, 2, 1))    # (B, T, N)
            a_t = jax.lax.dynamic_slice(
                align_tn, (0, t, 0), (B, 1, align_tn.shape[2]))[:, 0]
            p_t = jax.lax.dynamic_slice(maxatt, (0, t), (B, 1))[:, 0]
            Y = jax.lax.dynamic_update_slice(Y, y_t[:, None, :], (0, t, 0))
            A_out = jax.lax.dynamic_update_slice(A_out, a_t[:, None, :],
                                                 (0, t, 0))
            return Y, Q, A_out, p_t.astype(jnp.int32), y_t, enc_bufs

        carry = (Y, Q, A_out, prev, prev_y, list(enc_bufs))
        Y, _, A_out, _, _, _ = jax.lax.fori_loop(0, max_t, body, carry)
        return Y, jnp.transpose(A_out, (0, 2, 1))
