"""FireFlowNet — the lightweight recurrent flow-net family.

The reference snapshot ships only ``RecEVFlowNet`` (its ``models/model.py:6``
docstring points at the NeurIPS'21 paper that also introduces the
FireNet-based lightweight variants). This module provides that family for
completeness: a full-resolution, no-downsampling stack

    head conv -> ConvGRU -> conv -> ConvGRU -> conv -> 1x1 tanh prediction

(FireNet topology, Scheerlinck et al.; recurrent units swapped per variant).
Single-scale output, shaped like one entry of RecEVFlowNet's flow list, so
losses/metrics consume it unchanged (``S = 1``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvLayer, ConvGRU


class RecFireFlowNet(nn.Module):
    """Recurrent FireFlowNet: two ConvGRU cells at full resolution."""

    num_bins: int = 2
    base_channels: int = 32
    kernel_size: int = 3
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, train: bool = True):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        c = self.base_channels
        x = ConvLayer(c, self.kernel_size, activation="relu", dtype=dtype,
                      name="head")(x, train=train)
        x, h1 = ConvGRU(c, self.kernel_size, dtype=dtype, name="gru1")(
            x, state[0]
        )
        x = ConvLayer(c, self.kernel_size, activation="relu", dtype=dtype,
                      name="conv1")(x, train=train)
        x, h2 = ConvGRU(c, self.kernel_size, dtype=dtype, name="gru2")(
            x, state[1]
        )
        x = ConvLayer(c, self.kernel_size, activation="relu", dtype=dtype,
                      name="conv2")(x, train=train)
        flow = ConvLayer(
            2, 1, activation=self.final_activation,
            w_scale=self.final_w_scale, dtype=dtype, name="pred",
        )(x, train=train)
        flow = flow.astype(jnp.float32)
        return flow[None], (h1, h2)  # [S=1, B, H, W, 2]

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        c = self.base_channels
        return (
            jnp.zeros((batch, height, width, c), dtype),
            jnp.zeros((batch, height, width, c), dtype),
        )


class FireFlowNet(nn.Module):
    """Stateless FireFlowNet (feed-forward; same stack, no GRUs)."""

    num_bins: int = 2
    base_channels: int = 32
    kernel_size: int = 3
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, state=None, train: bool = True):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        c = self.base_channels
        for i, name in enumerate(["head", "conv1", "conv2", "conv3"]):
            x = ConvLayer(c, self.kernel_size, activation="relu",
                          dtype=dtype, name=name)(x, train=train)
        flow = ConvLayer(
            2, 1, activation=self.final_activation,
            w_scale=self.final_w_scale, dtype=dtype, name="pred",
        )(x, train=train)
        return flow.astype(jnp.float32)[None], ()

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        return ()
