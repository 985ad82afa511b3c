"""Multi-resolution (recurrent) UNet architectures (flax.linen, NHWC).

TPU-native counterpart of the reference UNet family
(reference ``models/arch.py:6-242``): strided (ConvGRU-)encoders, residual
bottleneck, multi-resolution prediction decoders whose previous-scale
prediction is concatenated into the next decoder's input. The recurrent state
is an explicit pytree carry (tuple of per-encoder hidden maps) — no hidden
module state, so the whole net scans/jits/shards cleanly.
"""

from __future__ import annotations

from dataclasses import field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    ConvLayer,
    RecurrentConvLayer,
    ResidualBlock,
    UpsampleConvLayer,
    TransposedConvLayer,
)


def _skip_sum(x, y):
    """Sum skip connection with odd-dimension crop (reference ``arch.py:69-80``)."""
    if x.shape[1:3] != y.shape[1:3]:
        x = x[:, : y.shape[1], : y.shape[2], :]
    return x + y


def _skip_concat(x, y):
    if x.shape[1:3] != y.shape[1:3]:
        x = x[:, : y.shape[1], : y.shape[2], :]
    return jnp.concatenate([x, y], axis=-1)


class UNetConfig:
    """Shared channel-schedule arithmetic (reference ``arch.py:60-67``)."""

    @staticmethod
    def encoder_channels(base_channels: int, num_encoders: int,
                         channel_multiplier: float) -> Tuple[list, list]:
        ins = [
            int(base_channels * channel_multiplier ** (i - 1))
            for i in range(num_encoders)
        ]
        outs = [
            int(base_channels * channel_multiplier**i)
            for i in range(num_encoders)
        ]
        return ins, outs


class MultiResUNetRecurrent(nn.Module):
    """Recurrent multi-res UNet (reference ``arch.py:197-242``).

    ``__call__(x, state) -> (predictions, new_state)`` where ``state`` is a
    tuple of ``num_encoders`` hidden maps (zeros to bootstrap) and
    ``predictions`` is a coarse→fine list of ``[B, h_i, w_i, out]`` maps.
    """

    num_bins: int = 2
    base_channels: int = 64
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    kernel_size: int = 3
    encoder_stride: int = 2
    channel_multiplier: float = 2
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    ff_act: Optional[str] = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, state, train: bool = True):
        ins, outs = UNetConfig.encoder_channels(
            self.base_channels, self.num_encoders, self.channel_multiplier
        )
        skip = _skip_sum if self.skip_type == "sum" else _skip_concat
        up_type = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer

        # encoders: strided conv + ConvGRU, explicit carry per stage
        blocks = []
        new_state = []
        for i, out_ch in enumerate(outs):
            x, h = RecurrentConvLayer(
                out_ch,
                kernel_size=self.kernel_size,
                stride=self.encoder_stride,
                activation_ff=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(x, state[i], train=train)
            blocks.append(x)
            new_state.append(h)

        # residual bottleneck
        for j in range(self.num_residual_blocks):
            x = ResidualBlock(
                outs[-1],
                activation=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"resblock_{j}",
            )(x, train=train)

        # decoders + multires prediction heads; previous prediction is
        # concatenated into the next decoder input (reference arch.py:233-240)
        decoder_outs = list(reversed(ins))
        predictions = []
        for i, out_ch in enumerate(decoder_outs):
            x = skip(x, blocks[self.num_encoders - i - 1])
            if i > 0:
                x = _skip_concat(predictions[-1], x)
            x = up_type(
                out_ch,
                kernel_size=self.kernel_size,
                activation=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"decoder_{i}",
            )(x, train=train)
            pred = ConvLayer(
                self.num_output_channels,
                kernel_size=1,
                activation=self.final_activation,
                norm=self.norm,
                w_scale=self.final_w_scale,
                dtype=self.dtype,
                name=f"pred_{i}",
            )(x, train=train)
            # keep the prediction in compute dtype INSIDE the loop: casting
            # it to f32 here promotes the next level's whole concat (pred ++
            # decoder activations, 66/130/258 channels) to f32, so the
            # following bilinear upsample + pads run at DOUBLE width in
            # bf16 inference mode — measured as the dominant share of the
            # DSEC window's "data formatting" HLO time — and the very next
            # conv casts its operands back to bf16 anyway, so the f32
            # excursion adds no precision where it matters. f32 mode
            # (dtype=None) is bit-identical either way.
            predictions.append(pred)

        return [p.astype(jnp.float32) for p in predictions], tuple(new_state)

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, ...]:
        """Zero carry for a (padded) input of ``[batch, height, width, ...]``."""
        _, outs = UNetConfig.encoder_channels(
            self.base_channels, self.num_encoders, self.channel_multiplier
        )
        state = []
        h, w = height, width
        for out_ch in outs:
            h = (h + 2 * (self.kernel_size // 2) - self.kernel_size) // self.encoder_stride + 1
            w = (w + 2 * (self.kernel_size // 2) - self.kernel_size) // self.encoder_stride + 1
            state.append(jnp.zeros((batch, h, w, out_ch), dtype=dtype))
        return tuple(state)


class MultiResUNet(nn.Module):
    """Stateless multi-res UNet (feed-forward encoders; same decode path).

    Non-recurrent sibling of :class:`MultiResUNetRecurrent` for single-window
    inference; the reference architecture family documents this variant in
    its base class (reference ``arch.py:6-195``).
    """

    num_bins: int = 2
    base_channels: int = 64
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    kernel_size: int = 3
    encoder_stride: int = 2
    channel_multiplier: float = 2
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    ff_act: Optional[str] = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ins, outs = UNetConfig.encoder_channels(
            self.base_channels, self.num_encoders, self.channel_multiplier
        )
        skip = _skip_sum if self.skip_type == "sum" else _skip_concat
        up_type = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer

        blocks = []
        for i, out_ch in enumerate(outs):
            x = ConvLayer(
                out_ch,
                kernel_size=self.kernel_size,
                stride=self.encoder_stride,
                activation=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(x, train=train)
            blocks.append(x)

        for j in range(self.num_residual_blocks):
            x = ResidualBlock(
                outs[-1],
                activation=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"resblock_{j}",
            )(x, train=train)

        decoder_outs = list(reversed(ins))
        predictions = []
        for i, out_ch in enumerate(decoder_outs):
            x = skip(x, blocks[self.num_encoders - i - 1])
            if i > 0:
                x = _skip_concat(predictions[-1], x)
            x = up_type(
                out_ch,
                kernel_size=self.kernel_size,
                activation=self.ff_act,
                norm=self.norm,
                dtype=self.dtype,
                name=f"decoder_{i}",
            )(x, train=train)
            pred = ConvLayer(
                self.num_output_channels,
                kernel_size=1,
                activation=self.final_activation,
                norm=self.norm,
                w_scale=self.final_w_scale,
                dtype=self.dtype,
                name=f"pred_{i}",
            )(x, train=train)
            # compute-dtype inside the loop; f32 only at the boundary (see
            # the recurrent variant above)
            predictions.append(pred)

        return [p.astype(jnp.float32) for p in predictions]
