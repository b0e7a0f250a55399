"""Temporal Convolutional Network text encoder.

Rebuild of the reference's locuslab TCN (scripts/model/tcn.py) and
TextEncoderTCN (hierarchy_net.py:22-52, multimodal_context_net.py:31-61).

TPU notes: the reference implements causality as symmetric padding + right
"chomp"; here each dilated conv simply left-pads (k-1)*dilation — identical
math, half the padded compute.  Weight normalization is reparameterized
explicitly (kernel = g * v / ||v||), matching torch's weight_norm semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.models.common import Dense, torch_kaiming_uniform, _bias_init_for
from ha2g_tpu.ops.precision import resolve


class WeightNormConv1d(nn.Module):
    """Causal dilated conv with torch-style weight_norm, NWC layout."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        shape = (self.kernel_size, in_dim, self.features)
        v = self.param("v", torch_kaiming_uniform, shape)
        # torch weight_norm initializes g = ||v|| per output channel
        g = self.param(
            "g",
            lambda key, s: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0),
            (self.features,))
        b = self.param("b", _bias_init_for(in_dim * self.kernel_size),
                       (self.features,))
        # weight-norm math in float32 (param dtype); only the conv itself
        # runs in the compute dtype
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
        cdt = resolve(None)
        pad = (self.kernel_size - 1) * self.dilation
        y = jax.lax.conv_general_dilated(
            x.astype(cdt), kernel.astype(cdt), window_strides=(1,),
            padding=[(pad, 0)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + b.astype(cdt)


class TemporalBlock(nn.Module):
    """Two weight-normed causal convs + residual (reference tcn.py:16-46)."""

    features: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = x
        y = WeightNormConv1d(self.features, self.kernel_size, self.dilation)(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = WeightNormConv1d(self.features, self.kernel_size, self.dilation)(y)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        if res.shape[-1] != self.features:
            # 1x1 downsample conv (reference tcn.py:33)
            res = nn.Conv(self.features, (1,),
                          kernel_init=torch_kaiming_uniform,
                          bias_init=_bias_init_for(res.shape[-1]),
                          dtype=resolve(None))(res)
        return jax.nn.relu(y + res)


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks with dilation 2^i (reference tcn.py:49-64)."""

    channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, ch in enumerate(self.channels):
            x = TemporalBlock(ch, self.kernel_size, 2 ** i, self.dropout)(
                x, deterministic=deterministic)
        return x


class TextEncoderTCN(nn.Module):
    """fastText embedding -> TCN -> Linear(32) per frame
    (reference hierarchy_net.py:22-52).

    `embeddings` (n_words, embed_dim) optionally initializes the table;
    `freeze` stops gradients through it (args.freeze_wordembed).
    Returns (B, T, 32).
    """

    n_words: int
    embed_dim: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    kernel_size: int = 2
    dropout: float = 0.3
    emb_dropout: float = 0.1
    freeze: bool = False
    embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        if self.embeddings is not None:
            emb_init = lambda key, shape: jnp.asarray(self.embeddings)
        else:
            emb_init = nn.initializers.normal(stddev=1.0)
        table = self.param("embedding", emb_init,
                           (self.n_words, self.embed_dim))
        if self.freeze:
            table = jax.lax.stop_gradient(table)
        emb = jnp.take(table, tokens, axis=0)
        emb = nn.Dropout(self.emb_dropout)(emb, deterministic=deterministic)
        y = TemporalConvNet([self.hidden_size] * self.n_layers,
                            self.kernel_size, self.dropout)(
            emb, deterministic=deterministic)
        # decoder init: weight normal(0, 0.01), bias 0 (hierarchy_net.py:44-46)
        y = nn.Dense(32, kernel_init=nn.initializers.normal(stddev=0.01),
                     bias_init=nn.initializers.zeros,
                     dtype=resolve(None))(y)
        return y
