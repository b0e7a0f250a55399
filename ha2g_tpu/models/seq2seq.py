"""Seq2seq text-to-gesture baseline (Yoon et al. ICRA'19).

Rebuild of scripts/model/seq2seq_net.py: a packed bidirectional GRU text
encoder, Bahdanau attention, and an autoregressive per-frame GRU decoder
teacher-forced for the first n_pre_poses frames.

TPU-first differences from the reference:
* The packed-sequence encoder (seq2seq_net.py:52-54) becomes a fixed-shape
  masked bi-GRU: the forward carry freezes at each sequence's length and the
  backward direction reverses within each sequence's true length, so outputs
  and finals are numerically identical to pack/pad_packed (padded positions
  emit zeros).
* The decoder's python time loop (seq2seq_net.py:244-253) becomes a
  `nn.scan` over time with a traced teacher-forcing switch at n_pre_poses;
  BatchNorm statistics inside the step are carried through the scan.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.models.common import BatchNorm, Dense
from ha2g_tpu.ops.gru import GRUCell, _torch_rnn_init


class MaskedBiGRUEncoder(nn.Module):
    """Bidirectional GRU over padded (B, T) token sequences with per-sequence
    lengths; packed-sequence-equivalent outputs (reference EncoderRNN,
    seq2seq_net.py:14-56).  Returns (outputs (B, T, H) fwd+bwd summed, final
    hidden (n_layers*2, B, H) in torch layer-major/direction-minor order)."""

    n_words: int
    embed_dim: int
    hidden_size: int
    n_layers: int = 2
    dropout: float = 0.1
    embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        B, T = tokens.shape
        H = self.hidden_size
        if self.embeddings is not None:
            emb_init = lambda key, shape: jnp.asarray(self.embeddings)
        else:
            emb_init = nn.initializers.normal(stddev=1.0)
        table = self.param("embedding", emb_init, (self.n_words, self.embed_dim))
        x = jnp.take(table, tokens, axis=0)  # (B, T, E)

        t_idx = jnp.arange(T)
        valid = t_idx[None, :] < lengths[:, None]             # (B, T)
        # per-sequence reversal index (identity beyond length)
        rev_idx = jnp.where(valid, lengths[:, None] - 1 - t_idx[None, :],
                            t_idx[None, :])

        init = _torch_rnn_init(H)
        finals = []
        inp = x
        for layer in range(self.n_layers):
            in_dim = inp.shape[-1]

            def p(name, shape):
                return self.param(f"{name}_l{layer}", init, shape)

            w_ih = p("w_ih", (2, in_dim, 3 * H))
            w_hh = p("w_hh", (2, H, 3 * H))
            b_ih = p("b_ih", (2, 3 * H))
            b_hh = p("b_hh", (2, 3 * H))

            inp_rev = jnp.take_along_axis(inp, rev_idx[..., None], axis=1)
            xp = jnp.einsum("nbtd,ndg->tnbg",
                            jnp.stack([inp, inp_rev]), w_ih) + b_ih[None, :, None, :]
            mask_t = valid.T  # (T, B); same for fwd and per-seq-reversed stream

            def step(h, inputs):
                x_t, m = inputs  # (2, B, 3H), (B,)
                hh = jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh[:, None, :]
                x_r, x_z, x_n = jnp.split(x_t, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
                r = jax.nn.sigmoid(x_r + h_r)
                z = jax.nn.sigmoid(x_z + h_z)
                n = jnp.tanh(x_n + r * h_n)
                h_new = (1.0 - z) * n + z * h
                h_new = jnp.where(m[None, :, None], h_new, h)  # freeze at pad
                return h_new, h_new

            h0 = jnp.zeros((2, B, H))
            h_final, outs = jax.lax.scan(step, h0, (xp, mask_t))
            finals.append(h_final)

            fwd = jnp.transpose(outs[:, 0], (1, 0, 2))                  # (B,T,H)
            bwd = jnp.transpose(outs[:, 1], (1, 0, 2))
            bwd = jnp.take_along_axis(bwd, rev_idx[..., None], axis=1)  # un-reverse
            layer_out = jnp.concatenate([fwd, bwd], axis=-1)
            layer_out = jnp.where(valid[..., None], layer_out, 0.0)
            inp = layer_out
            if self.dropout > 0 and layer < self.n_layers - 1:
                inp = nn.Dropout(self.dropout)(inp, deterministic=deterministic)

        outputs = inp[..., :H] + inp[..., H:]  # sum directions (:55)
        h_n = jnp.concatenate(finals, axis=0)  # (n_layers*2, B, H)
        return outputs, h_n


class Attn(nn.Module):
    """Bahdanau additive attention (seq2seq_net.py:59-89)."""

    hidden_size: int

    @nn.compact
    def __call__(self, hidden, encoder_outputs):
        """hidden (B, H); encoder_outputs (B, T, H) -> weights (B, T)."""
        B, T, H = encoder_outputs.shape
        h = jnp.broadcast_to(hidden[:, None, :], (B, T, H))
        energy = jnp.tanh(Dense(self.hidden_size)(
            jnp.concatenate([h, encoder_outputs], axis=2)))
        v = self.param("v", nn.initializers.normal(
            stddev=1.0 / math.sqrt(self.hidden_size)), (self.hidden_size,))
        scores = jnp.einsum("bth,h->bt", energy, v)
        return jax.nn.softmax(scores, axis=1)


class _DecoderStep(nn.Module):
    """One decoder step: attention context + pre-linear(+BN) + GRU cell stack
    + output head (seq2seq_net.py:140-187)."""

    hidden_size: int
    output_size: int
    n_layers: int
    dropout: float
    n_speakers: int = 0

    @nn.compact
    def __call__(self, motion_input, last_hidden, encoder_outputs,
                 vid_indices, train: bool = False):
        attn_w = Attn(self.hidden_size)(last_hidden[-1], encoder_outputs)
        context = jnp.einsum("bt,bth->bh", attn_w, encoder_outputs)
        rnn_input = jnp.concatenate([motion_input, context], axis=1)
        if self.n_speakers > 0:
            table = self.param("speaker_embedding",
                               nn.initializers.normal(stddev=1.0),
                               (self.n_speakers, 8))
            rnn_input = jnp.concatenate(
                [rnn_input, jnp.take(table, vid_indices, axis=0)], axis=1)
        rnn_input = Dense(self.hidden_size)(rnn_input)
        rnn_input = BatchNorm(use_running_average=not train)(rnn_input)
        rnn_input = jax.nn.relu(rnn_input)
        out, new_hidden = GRUCell(self.hidden_size, self.n_layers,
                                  self.dropout)(rnn_input, last_hidden,
                                                deterministic=not train)
        return Dense(self.output_size)(out), new_hidden, attn_w


class Seq2SeqNet(nn.Module):
    """Full text->gesture seq2seq (seq2seq_net.py:217-254)."""

    pose_dim: int
    n_frames: int
    n_words: int
    word_embed_dim: int = 300
    hidden_size: int = 200
    n_layers: int = 2
    dropout: float = 0.1
    n_pre_poses: int = 4
    n_speakers: int = 0
    word_embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, in_text, text_lengths, poses, vid_indices,
                 train: bool = False):
        """in_text (B, S); text_lengths (B,); poses (B, T, pose_dim) teacher
        targets -> (B, T, pose_dim)."""
        enc_out, enc_hidden = MaskedBiGRUEncoder(
            n_words=self.n_words, embed_dim=self.word_embed_dim,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            dropout=self.dropout, embeddings=self.word_embeddings)(
            in_text, text_lengths, deterministic=not train)
        dec_hidden = enc_hidden[:self.n_layers]  # (:238)

        # autoregressive loop with teacher forcing for t < n_pre_poses
        # (:244-253).  T is static (34), so a python unroll of the shared
        # decoder-step module gives XLA one flat graph to schedule.
        step_mod = _DecoderStep(
            hidden_size=self.hidden_size, output_size=self.pose_dim,
            n_layers=self.n_layers, dropout=self.dropout,
            n_speakers=self.n_speakers, name="decoder_step")
        outputs = [poses[:, 0]]
        dec_in = poses[:, 0]
        hidden = dec_hidden
        for t in range(1, self.n_frames):
            out, hidden, _ = step_mod(dec_in, hidden, enc_out, vid_indices,
                                      train=train)
            outputs.append(out)
            dec_in = poses[:, t] if t < self.n_pre_poses else out
        return jnp.stack(outputs, axis=1)
