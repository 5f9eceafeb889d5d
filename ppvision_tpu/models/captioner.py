"""Attention-LSTM caption decoder ("Show, Attend and Tell") in Flax.

Same model family as the reference ``DecoderWithAttention`` /
``Attention`` (``Image_Caption/models.py:57-218``), restructured for
XLA:

- The per-timestep Python loop with its sort-by-length batch-shrink
  trick (models.py:183-216) becomes a ``lax.scan`` over time with an
  active-row mask — identical results (inactive rows keep zeros in the
  outputs and frozen LSTM state), static shapes, no host control flow.
- The LSTM cell is explicit (torch ``LSTMCell`` gate order i,f,g,o) so
  torch checkpoints map 1:1.
- Beam search (reference ``eval/eval_total.py:96-175``) is a scan with
  a fixed step budget and finished-beam masking instead of
  data-dependent early exit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["AttentionLSTMDecoder", "DecoderOutput", "beam_search", "beam_search_batch"]


class DecoderOutput(NamedTuple):
    predictions: jnp.ndarray  # (B, T, vocab)
    alphas: jnp.ndarray  # (B, T, num_pixels)
    decode_lengths: jnp.ndarray  # (B,) = caption_lengths - 1


class AttentionLSTMDecoder(nn.Module):
    """Additive attention over encoder pixels + gated LSTM decoding."""

    vocab_size: int
    embed_dim: int = 512
    decoder_dim: int = 512
    attention_dim: int = 512
    encoder_dim: int = 2048
    dropout: float = 0.5

    def setup(self):
        def u01(key, shape, dtype=jnp.float32):
            # Reference init_weights: U(-0.1, 0.1) (models.py:127-133).
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        self.embedding = nn.Embed(
            self.vocab_size, self.embed_dim, embedding_init=u01
        )
        self.att_enc = nn.Dense(self.attention_dim)
        self.att_dec = nn.Dense(self.attention_dim)
        self.att_full = nn.Dense(1)
        self.init_h = nn.Dense(self.decoder_dim)
        self.init_c = nn.Dense(self.decoder_dim)
        self.f_beta = nn.Dense(self.encoder_dim)
        self.lstm_x = nn.Dense(4 * self.decoder_dim)  # input -> gates
        self.lstm_h = nn.Dense(4 * self.decoder_dim)  # hidden -> gates
        self.fc = nn.Dense(self.vocab_size, kernel_init=u01)
        self.drop = nn.Dropout(self.dropout)

    def attend(self, enc: jnp.ndarray, h: jnp.ndarray, enc_proj=None):
        """Additive attention (models.py:75-89): enc (B, P, E), h (B, D).

        ``enc_proj`` = att_enc(enc), loop-invariant across decode steps
        — pass it precomputed when decoding (the projection is ~174 GF
        per step at eval shapes; recomputing it inside the scan was the
        dominant cost of the whole caption train step).
        """
        if enc_proj is None:
            enc_proj = self.att_enc(enc)
        att = self.att_full(
            nn.relu(enc_proj + self.att_dec(h)[:, None, :])
        )[..., 0]
        alpha = jax.nn.softmax(att, axis=1)
        ctx = jnp.sum(enc * alpha[..., None], axis=1)
        return ctx, alpha

    def lstm_step(self, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        """torch LSTMCell semantics, gate order (i, f, g, o)."""
        gates = self.lstm_x(x) + self.lstm_h(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def init_state(self, enc: jnp.ndarray):
        mean = jnp.mean(enc, axis=1)
        return self.init_h(mean), self.init_c(mean)

    def step(self, enc, emb_t, h, c, deterministic: bool = True, enc_proj=None):
        """One decode step: attention -> gate -> LSTM -> vocab scores."""
        ctx, alpha = self.attend(enc, h, enc_proj)
        gate = jax.nn.sigmoid(self.f_beta(h))
        ctx = gate * ctx
        h, c = self.lstm_step(jnp.concatenate([emb_t, ctx], axis=-1), h, c)
        preds = self.fc(self.drop(h, deterministic=deterministic))
        return preds, alpha, h, c

    def __call__(
        self,
        encoder_out: jnp.ndarray,  # (B, S, S, E) or (B, P, E)
        captions: jnp.ndarray,  # (B, L) int token ids
        caption_lengths: jnp.ndarray,  # (B,)
        deterministic: bool = True,
    ) -> DecoderOutput:
        b = encoder_out.shape[0]
        enc = encoder_out.reshape(b, -1, self.encoder_dim)
        decode_lengths = caption_lengths - 1
        max_t = captions.shape[1] - 1

        embeddings = self.embedding(captions)  # (B, L, emb)
        h, c = self.init_state(enc)
        enc_proj = self.att_enc(enc)  # hoisted out of the decode scan

        def scan_step(carry, t):
            h, c = carry
            active = (t < decode_lengths)[:, None].astype(enc.dtype)
            # The scan carries only the recurrence (attention + LSTM
            # cell); the vocab head runs ONCE on the stacked states
            # below — the serial loop was latency-bound on v5e (each
            # step ~15 small kernels at ~60 us dispatch-to-dispatch),
            # and fc is loop-invariant so T head launches collapse to
            # one (T*B, D) x (D, V) MXU call.  Identical math: fc and
            # dropout are elementwise-per-row, and the active mask is
            # applied to the head output exactly as before.
            ctx, alpha = self.attend(enc, h, enc_proj)
            gate = jax.nn.sigmoid(self.f_beta(h))
            h_new, c_new = self.lstm_step(
                jnp.concatenate([embeddings[:, t, :], gate * ctx], axis=-1),
                h, c,
            )
            # Inactive rows keep their state and emit zeros, matching the
            # reference's shrinking-batch semantics.
            h = active * h_new + (1 - active) * h
            c = active * c_new + (1 - active) * c
            return (h, c), (h_new, alpha * active)

        (_, _), (hs, alphas) = nn.scan(
            lambda mdl, carry, t: scan_step(carry, t),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
        )(self, (h, c), jnp.arange(max_t))
        # Vocab head over all steps at once: (T, B, D) -> (T, B, V).
        preds = self.fc(self.drop(hs, deterministic=deterministic))
        active = (
            jnp.arange(max_t)[:, None] < decode_lengths[None, :]
        ).astype(preds.dtype)[..., None]
        preds = preds * active
        # scan stacks on axis 0 -> (T, B, ...); move batch first.
        return DecoderOutput(
            predictions=jnp.transpose(preds, (1, 0, 2)),
            alphas=jnp.transpose(alphas, (1, 0, 2)),
            decode_lengths=decode_lengths,
        )


def caption_loss(
    out: DecoderOutput,
    captions: jnp.ndarray,
    alpha_c: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(cross-entropy, doubly-stochastic regularizer, top5-accuracy).

    CE averages over valid (packed) tokens only, as the reference's
    pack_padded_sequence + CrossEntropyLoss (train.py:274-286); the
    attention regularizer runs over the full zero-padded alphas, as the
    reference does.
    """
    targets = captions[:, 1:]  # (B, T)
    t = out.predictions.shape[1]
    mask = (
        jnp.arange(t)[None, :] < out.decode_lengths[:, None]
    ).astype(out.predictions.dtype)
    logp = jax.nn.log_softmax(out.predictions, axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = -jnp.sum(tok_logp * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    dsr = jnp.mean((1.0 - jnp.sum(out.alphas, axis=1)) ** 2)

    top5 = jax.lax.top_k(out.predictions, 5)[1]  # (B, T, 5)
    hit = jnp.any(top5 == targets[..., None], axis=-1).astype(jnp.float32)
    acc5 = 100.0 * jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return ce, dsr, acc5


def beam_search(
    decoder: AttentionLSTMDecoder,
    params: Any,
    encoder_out: jnp.ndarray,  # (1, S, S, E) single image
    start_token: int,
    end_token: int,
    beam_size: int = 5,
    max_steps: int = 50,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-budget beam search for one image.

    Returns (tokens (max_steps,), score) of the best completed sequence
    (or best live beam if none completed — the reference falls back
    similarly by breaking at 50 steps, eval_total.py:170-175).
    """
    k = beam_size
    enc = encoder_out.reshape(1, -1, decoder.encoder_dim)
    enc = jnp.broadcast_to(enc, (k, enc.shape[1], enc.shape[2]))
    # att_enc(enc) is step-invariant: project once, reuse in every beam step.
    enc_proj = decoder.apply(
        {"params": params}, enc, method=lambda m, e: m.att_enc(e)
    )

    def apply_step(h, c, tokens_t):
        emb = decoder.apply(
            {"params": params}, tokens_t, method=lambda m, t: m.embedding(t)
        )
        preds, alpha, h, c = decoder.apply(
            {"params": params},
            enc, emb, h, c, True, enc_proj,
            method=lambda m, e, x, hh, cc, det, ep: m.step(e, x, hh, cc, det, ep),
        )
        return jax.nn.log_softmax(preds, axis=-1), h, c

    h0, c0 = decoder.apply(
        {"params": params}, enc, method=lambda m, e: m.init_state(e)
    )

    neg_inf = jnp.float32(-1e9)
    state = dict(
        tokens=jnp.full((k, max_steps), end_token, dtype=jnp.int32),
        prev=jnp.full((k,), start_token, dtype=jnp.int32),
        scores=jnp.where(jnp.arange(k) == 0, 0.0, neg_inf),  # all beams start equal
        finished=jnp.zeros((k,), dtype=bool),
        h=h0,
        c=c0,
    )

    def step(state, t):
        logp, h, c = apply_step(state["h"], state["c"], state["prev"])
        v = logp.shape[-1]
        # Finished beams may only extend with end_token at zero cost.
        only_end = jnp.where(
            jnp.arange(v)[None, :] == end_token, 0.0, neg_inf
        )
        logp = jnp.where(state["finished"][:, None], only_end, logp)
        total = state["scores"][:, None] + logp  # (k, V)
        flat = total.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        beam_idx = top_idx // v
        tok = top_idx % v

        tokens = state["tokens"][beam_idx]
        # Record the new token at position t for unfinished parents.
        parent_fin = state["finished"][beam_idx]
        tokens = tokens.at[:, t].set(jnp.where(parent_fin, tokens[:, t], tok))
        finished = parent_fin | (tok == end_token)
        new_state = dict(
            tokens=tokens,
            prev=tok,
            scores=top_scores,
            finished=finished,
            h=h[beam_idx],
            c=c[beam_idx],
        )
        return new_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(max_steps))
    best = jnp.argmax(state["scores"])
    return state["tokens"][best], state["scores"][best]


def beam_search_batch(
    decoder: AttentionLSTMDecoder,
    params: Any,
    encoder_out: jnp.ndarray,  # (B, S, S, E)
    start_token: int,
    end_token: int,
    beam_size: int = 5,
    max_steps: int = 50,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``beam_search`` vmapped over a batch of images: one device
    program decodes B*k beams in lockstep instead of B host-looped
    bs=1 calls (the reference loops images one at a time,
    eval_total.py:96-175; identical results per image).

    Returns ((B, max_steps) tokens, (B,) scores).
    """
    return jax.vmap(
        lambda e: beam_search(
            decoder, params, e[None], start_token, end_token, beam_size, max_steps
        )
    )(encoder_out)
