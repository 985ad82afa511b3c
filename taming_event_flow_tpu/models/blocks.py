"""NN building blocks (flax.linen, NHWC).

TPU-native counterparts of the reference submodules
(reference ``models/submodules.py:8-325``) with matched initialization and
padding arithmetic so torch checkpoints can be ported layer-by-layer:

  * convs use explicit symmetric ``k // 2`` padding (torch ``Conv2d`` style,
    which differs from XLA ``SAME`` for strided convs),
  * feed-forward convs init uniform ``±sqrt(1 / fan_in)`` with ``fan_in``
    = input channels (reference ``submodules.py:34-37``),
  * ConvGRU gates init orthogonal over the flattened ``[out, in*k*k]``
    matrix with zero bias (reference ``submodules.py:127-132``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def uniform_fan_in_init(w_scale: Optional[float] = None):
    """Uniform(-s, s) kernel init, s = w_scale or sqrt(1 / in_channels)."""

    def init(key, shape, dtype=jnp.float32):
        # linen conv kernel shape: [kh, kw, in, out]
        s = w_scale if w_scale is not None else float(np.sqrt(1.0 / shape[2]))
        return jax.random.uniform(key, shape, dtype, minval=-s, maxval=s)

    return init


def orthogonal_torch_init():
    """Orthogonal init over the torch-flattened [out, in*kh*kw] matrix."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        flat = jax.nn.initializers.orthogonal()(key, (cout, cin * kh * kw), dtype)
        # torch layout [out, in, kh, kw] -> linen [kh, kw, in, out]
        w = flat.reshape(cout, cin, kh, kw)
        return jnp.transpose(w, (2, 3, 1, 0))

    return init


def get_activation(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    table = {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "gelu": nn.gelu,
    }
    return table[name]


class ConvLayer(nn.Module):
    """Conv + optional norm + optional activation (reference ``submodules.py:8-62``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    w_scale: Optional[float] = None
    use_bias: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 for MXU); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bias = self.use_bias
        if bias is None:
            bias = self.norm != "BN"
        pad = self.kernel_size // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=bias,
            kernel_init=uniform_fan_in_init(self.w_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        if self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        elif self.norm == "IN":
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
        act = get_activation(self.activation)
        if act is not None:
            x = act(x)
        return x


class ConvGRU(nn.Module):
    """Convolutional GRU cell (reference ``submodules.py:111-152``).

    Carry is the hidden state (same spatial dims as the input); callers
    bootstrap it with zeros via :func:`zeros_state`.
    """

    hidden: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, h):
        pad = self.kernel_size // 2

        def gate(name):
            return nn.Conv(
                features=self.hidden,
                kernel_size=(self.kernel_size, self.kernel_size),
                padding=((pad, pad), (pad, pad)),
                use_bias=True,
                kernel_init=orthogonal_torch_init(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=name,
            )

        stacked = jnp.concatenate([x, h], axis=-1)
        update = jax.nn.sigmoid(gate("update_gate")(stacked))
        reset = jax.nn.sigmoid(gate("reset_gate")(stacked))
        out = jnp.tanh(gate("out_gate")(jnp.concatenate([x, h * reset], axis=-1)))
        new_h = h * (1.0 - update) + out * update
        return new_h, new_h


class RecurrentConvLayer(nn.Module):
    """Strided conv + ConvGRU (reference ``submodules.py:65-108``)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    activation_ff: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, h, train: bool = True):
        x = ConvLayer(
            self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            activation=self.activation_ff,
            norm=self.norm,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)
        x, h = ConvGRU(
            self.features, kernel_size=3, dtype=self.dtype,
            name="recurrent_block",
        )(x, h)
        return x, h


class ResidualBlock(nn.Module):
    """Two convs + identity shortcut (reference ``submodules.py:155-227``)."""

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation)
        residual = x
        pad = self.kernel_size // 2

        def conv(name):
            return nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                padding=((pad, pad), (pad, pad)),
                use_bias=self.norm != "BN",
                dtype=self.dtype,
                name=name,
            )

        out = conv("conv1")(x)
        if act is not None:
            out = act(out)
        out = conv("conv2")(out)
        out = out + residual
        if act is not None:
            out = act(out)
        return out


class UpsampleConvLayer(nn.Module):
    """Bilinear x2 upsample + conv (reference ``submodules.py:230-273``).

    ``jax.image.resize(method="bilinear")`` uses half-pixel centers —
    the semantics of torch ``interpolate(align_corners=False)``.
    """

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        return ConvLayer(
            self.features,
            kernel_size=self.kernel_size,
            stride=1,
            activation=self.activation,
            norm=self.norm,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)


class TransposedConvLayer(nn.Module):
    """Transposed conv x2 upsample (reference ``submodules.py:276-325``)."""

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch ConvTranspose2d(stride=2, padding=k//2, output_padding=1)
        # doubles the spatial dims exactly.
        x = nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(2, 2),
            padding="SAME",
            use_bias=self.norm != "BN",
            dtype=self.dtype,
        )(x)
        act = get_activation(self.activation)
        if act is not None:
            x = act(x)
        return x
