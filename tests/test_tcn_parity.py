"""TCN parity vs torch: weight-norm reparameterization and causal dilated
convolutions must match the locuslab TCN the reference embeds
(scripts/model/tcn.py)."""

import numpy as np
import pytest
import torch
import torch.nn as torch_nn
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from ha2g_tpu.models.tcn import WeightNormConv1d


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_weightnorm_causal_conv_matches_torch(dilation):
    torch.manual_seed(0)
    B, T, CIN, COUT, K = 2, 12, 5, 7, 2
    pad = (K - 1) * dilation
    tconv = weight_norm(torch_nn.Conv1d(CIN, COUT, K, padding=pad,
                                        dilation=dilation))
    x = torch.randn(B, CIN, T)
    with torch.no_grad():
        # reference chomps the right-side padding (tcn.py:7-13)
        want = tconv(x)[:, :, :-pad].numpy()

    m = WeightNormConv1d(features=COUT, kernel_size=K, dilation=dilation)
    # torch weight_v (COUT, CIN, K) -> flax v (K, CIN, COUT)
    v = tconv.weight_v.detach().numpy().transpose(2, 1, 0)
    g = tconv.weight_g.detach().numpy().reshape(-1)
    b = tconv.bias.detach().numpy()
    params = {"params": {"v": jnp.asarray(v), "g": jnp.asarray(g),
                         "b": jnp.asarray(b)}}
    got = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_weightnorm_g_initialized_to_v_norm():
    import jax
    m = WeightNormConv1d(features=6, kernel_size=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 3)))
    v = np.asarray(variables["params"]["v"])
    g = np.asarray(variables["params"]["g"])
    np.testing.assert_allclose(g, np.linalg.norm(v.reshape(-1, 6), axis=0),
                               rtol=1e-6)
