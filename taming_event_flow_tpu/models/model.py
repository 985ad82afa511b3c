"""Flagship flow models: RecEVFlowNet / EVFlowNet.

Functional TPU-native counterpart of the reference model wrapper
(reference ``models/model.py:6-85`` + ``models/model_util.py:29-71``):

  * top-left zero-pad to a multiple of 16 so strided encoders divide evenly,
  * multi-res UNet forward with explicit recurrent carry,
  * per-scale bilinear upsample of the predictions to the input resolution
    with flow-magnitude scaling ``2 ** (num_encoders - i - 1)``,
  * returns all scales stacked ``[S, B, H, W, 2]`` (coarse→fine; the
    reference's ``{"flow": [...]}`` list) and the new carry.

State semantics match ``reset_states`` (zero carry) and ``detach_states``
(a no-op here: the carry is returned fresh from a jitted step, so TBPTT
truncation falls out of functional purity).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import MultiResUNetRecurrent, MultiResUNet


def pad_to_multiple(x, min_size: int = 16):
    """Top-left zero-pad NHWC input to a multiple of ``min_size``.

    (reference ``models/model_util.py:52-65`` pads left & top)
    """
    h, w = x.shape[1], x.shape[2]
    ph = (min_size - h % min_size) % min_size
    pw = (min_size - w % min_size) % min_size
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, 0), (pw, 0), (0, 0)))
    return x, (ph, pw)


def unpad(x, pads: Tuple[int, int]):
    ph, pw = pads
    return x[:, ph:, pw:, :]


class RecEVFlowNet(nn.Module):
    """Recurrent EV-FlowNet (reference ``models/model.py:6-85``).

    ``__call__(x, state) -> (flows, new_state)`` with ``x`` ``[B, H, W, C]``
    (count or voxel encoding) and ``flows`` ``[S, B, H, W, 2]``, last dim
    ``(x, y)``, finest scale last. Flow values are in the final activation's
    range; callers apply ``flow_scaling`` (reference ``train_flow.py:107-108``).
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
    channel_multiplier: float = 2
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    min_size: int = 16
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for MXU throughput

    @nn.nowrap
    def _arch(self, name=None) -> MultiResUNetRecurrent:
        kwargs = dict(
            num_bins=self.num_bins,
            base_channels=self.base_channels,
            num_encoders=self.num_encoders,
            num_residual_blocks=self.num_residual_blocks,
            num_output_channels=self.num_output_channels,
            skip_type=self.skip_type,
            norm=self.norm,
            use_upsample_conv=self.use_upsample_conv,
            kernel_size=self.kernel_size,
            channel_multiplier=self.channel_multiplier,
            final_activation=self.final_activation,
            final_w_scale=self.final_w_scale,
            dtype=jnp.dtype(self.compute_dtype) if self.compute_dtype else None,
        )
        if name is not None:
            kwargs["name"] = name
        return MultiResUNetRecurrent(**kwargs)

    @nn.compact
    def __call__(self, x, state, train: bool = True):
        x, pads = pad_to_multiple(x, self.min_size)
        b, hp, wp, _ = x.shape

        preds, new_state = self._arch(name="arch")(x, state, train=train)

        flows = []
        for i, flow in enumerate(preds):
            scale = 2 ** (self.num_encoders - i - 1)
            up = jax.image.resize(
                flow, (b, hp, wp, flow.shape[-1]), method="bilinear"
            )
            flows.append(unpad(scale * up, pads))
        return jnp.stack(flows, axis=0), new_state

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        """Zero recurrent carry (= reference ``reset_states``)."""
        ph = (self.min_size - height % self.min_size) % self.min_size
        pw = (self.min_size - width % self.min_size) % self.min_size
        return self._arch().init_state(batch, height + ph, width + pw, dtype)


class EVFlowNet(nn.Module):
    """Stateless multi-res EV-FlowNet variant (same decode path, no GRU)."""

    num_bins: int = 2
    base_channels: int = 64
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    kernel_size: int = 3
    channel_multiplier: float = 2
    final_activation: Optional[str] = "tanh"
    final_w_scale: Optional[float] = None
    min_size: int = 16
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, state=None, train: bool = True):
        x, pads = pad_to_multiple(x, self.min_size)
        b, hp, wp, _ = x.shape
        preds = MultiResUNet(
            num_bins=self.num_bins,
            base_channels=self.base_channels,
            num_encoders=self.num_encoders,
            num_residual_blocks=self.num_residual_blocks,
            num_output_channels=self.num_output_channels,
            skip_type=self.skip_type,
            norm=self.norm,
            use_upsample_conv=self.use_upsample_conv,
            kernel_size=self.kernel_size,
            channel_multiplier=self.channel_multiplier,
            final_activation=self.final_activation,
            final_w_scale=self.final_w_scale,
            dtype=jnp.dtype(self.compute_dtype) if self.compute_dtype else None,
            name="arch",
        )(x, train=train)
        flows = []
        for i, flow in enumerate(preds):
            scale = 2 ** (self.num_encoders - i - 1)
            up = jax.image.resize(
                flow, (b, hp, wp, flow.shape[-1]), method="bilinear"
            )
            flows.append(unpad(scale * up, pads))
        return jnp.stack(flows, axis=0), ()

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        return ()


from .fire import RecFireFlowNet, FireFlowNet  # noqa: E402

_MODEL_REGISTRY = {
    "RecEVFlowNet": RecEVFlowNet,
    "EVFlowNet": EVFlowNet,
    "RecFireFlowNet": RecFireFlowNet,
    "FireFlowNet": FireFlowNet,
}

# config keys that map onto module fields (reference model kwargs,
# ``models/model.py:21-37``)
_FIELD_KEYS = {
    "base_channels",
    "num_encoders",
    "num_residual_blocks",
    "num_output_channels",
    "skip_type",
    "norm",
    "use_upsample_conv",
    "kernel_size",
    "channel_multiplier",
    "final_activation",
    "final_w_scale",
    "min_size",
    "compute_dtype",
}


def build_model(model_config: Dict[str, Any], num_bins: int = 2):
    """Build a model from a config dict (replaces the reference's
    ``eval(config["model"]["name"])`` dispatch, ``train_flow.py:61``)."""
    name = model_config.get("name", "RecEVFlowNet")
    if name not in _MODEL_REGISTRY:
        raise ValueError(f"Unknown model: {name!r}")
    cls = _MODEL_REGISTRY[name]
    import dataclasses

    cls_fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {
        k: v for k, v in model_config.items()
        if k in _FIELD_KEYS and k in cls_fields
    }
    return cls(num_bins=num_bins, **kwargs)
