"""Shared building blocks for the model library.

Notes on fidelity to the reference (alvinliu0/HA2G):

* Initialization follows torch defaults (kaiming-uniform with a=sqrt(5) for
  Linear/Conv weights == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias the same)
  so that training dynamics start from the same distribution family.
* LeakyReLU slopes: the reference frequently writes ``nn.LeakyReLU(True)``,
  which in torch binds ``negative_slope=True == 1.0`` — i.e. the activation
  is the identity.  Where it writes ``nn.LeakyReLU(inplace=True)`` the slope
  is the default 0.01.  We reproduce each call site's *effective* slope
  (see e.g. multimodal_context_net.py:102 vs hierarchy_net.py:91).
* BatchNorm matches torch defaults: eps 1e-5, running-stat momentum 0.1
  (flax momentum 0.9).  Under jit+sharding the batch statistics are computed
  over the GLOBAL batch (sync-BN); the reference's DataParallel used
  per-replica stats — we document this intentional difference (SURVEY.md
  section 7 step 9).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.ops.precision import resolve


def torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch default weight init for Linear/Conv: U(-b, b), b = 1/sqrt(fan_in).

    shape conventions: Linear (in, out) -> fan_in = in;
    Conv (k..., in, out)  -> fan_in = in * prod(k).
    """
    if len(shape) == 2:
        fan_in = shape[0]
    else:
        receptive = math.prod(shape[:-2])
        fan_in = shape[-2] * receptive
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None  # None = the precision context

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = self.kernel_init or torch_kaiming_uniform
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=kinit,
                        bias_init=_bias_init_for(in_dim),
                        dtype=resolve(self.dtype))(x)


class Conv1d(nn.Module):
    """torch nn.Conv1d equivalent on (B, T, C) layout (NWC).

    torch's (B, C, T) layout is transposed at the framework boundary; all our
    internal tensors are feature-last, which is the TPU-friendly layout.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | str = 0  # int = symmetric zero pad (torch), or 'SAME'/'VALID'
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # None = the precision context

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)]
        else:
            pad = self.padding
        fan_in = in_dim * self.kernel_size
        return nn.Conv(self.features, (self.kernel_size,),
                       strides=(self.stride,), padding=pad,
                       kernel_dilation=(self.dilation,),
                       use_bias=self.use_bias,
                       kernel_init=torch_kaiming_uniform,
                       bias_init=_bias_init_for(fan_in),
                       dtype=resolve(self.dtype))(x)


class Conv2d(nn.Module):
    """torch nn.Conv2d equivalent on (B, H, W, C) layout (NHWC)."""

    features: int
    kernel_size: tuple[int, int] | int
    stride: tuple[int, int] | int = 1
    padding: tuple[int, int] | int | str = 0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None  # None = the precision context

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) \
            else (self.kernel_size, self.kernel_size)
        st = self.stride if isinstance(self.stride, tuple) \
            else (self.stride, self.stride)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            p = self.padding if isinstance(self.padding, tuple) \
                else (self.padding, self.padding)
            pad = [(p[0], p[0]), (p[1], p[1])]
        in_dim = x.shape[-1]
        fan_in = in_dim * ks[0] * ks[1]
        return nn.Conv(self.features, ks, strides=st, padding=pad,
                       use_bias=self.use_bias,
                       kernel_init=self.kernel_init or torch_kaiming_uniform,
                       bias_init=_bias_init_for(fan_in),
                       dtype=resolve(self.dtype))(x)


class BatchNorm(nn.Module):
    """torch-default BatchNorm (eps 1e-5, momentum 0.1) over the feature
    (last) axis; global-batch statistics under sharding (sync-BN)."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        # normalization itself stays float32 (mixed-precision practice:
        # small-batch variance in bf16 is noisy); output returns to the
        # active compute dtype
        out = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                           epsilon=1e-5,
                           dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(resolve(None))


def leaky_relu(x, slope: float):
    return jnp.where(x >= 0, x, slope * x)


class ConvNormRelu1d(nn.Module):
    """Reference ConvNormRelu (embedding_net.py:16-39 / motion_ae.py:8-31):
    k=3,s=1 or (downsample) k=4,s=2, BatchNorm, LeakyReLU(0.2)."""

    features: int
    downsample: bool = False
    padding: int = 0
    batchnorm: bool = True
    slope: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (4, 2) if self.downsample else (3, 1)
        x = Conv1d(self.features, k, stride=s, padding=self.padding)(x)
        if self.batchnorm:
            x = BatchNorm(use_running_average=not train)(x)
        return leaky_relu(x, self.slope)


class MLP(nn.Module):
    """Sequence of Dense(+BN)(+activation) layers, torch-style inits."""

    features: Sequence[int]
    # per-layer activation slope; None = no activation after that layer;
    # "relu" = ReLU; a float = LeakyReLU slope (1.0 == identity quirk)
    activations: Sequence[Optional[float | str]] = ()
    batchnorm: Sequence[bool] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        acts = self.activations or (None,) * len(self.features)
        bns = self.batchnorm or (False,) * len(self.features)
        for feat, act, bn in zip(self.features, acts, bns):
            x = Dense(feat)(x)
            if bn:
                x = BatchNorm(use_running_average=not train)(x)
            if act == "relu":
                x = jax.nn.relu(x)
            elif isinstance(act, float):
                x = leaky_relu(x, act)
        return x


def reparameterize(rng, mu, logvar):
    """VAE trick (reference embedding_net.py:10-13)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return mu + eps * std


def pre_emphasis(wav: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] with edge-replicated first sample
    (reference model/utils.py:22-37; referenced only by the commented-out
    torchaudio mel path, kept for API parity)."""
    first = wav[..., :1]
    prev = jnp.concatenate([first, wav[..., :-1]], axis=-1)
    return wav - coef * prev


def accuracy(output: jnp.ndarray, target: jnp.ndarray,
             topk=(1,)) -> list[jnp.ndarray]:
    """Top-k accuracy over logits (reference model/utils.py:7-19)."""
    maxk = max(topk)
    pred = jnp.argsort(output, axis=1)[:, ::-1][:, :maxk]
    correct = pred == target[:, None]
    return [jnp.sum(correct[:, :k].any(axis=1)) * 100.0 / target.shape[0]
            for k in topk]
