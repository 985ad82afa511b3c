from .base import LossConfig, focus_loss, iwe_with_ts, flow_spatial_smoothing, flow_temporal_smoothing
from .iterative import iterative_loss, warp_table
from .linear import linear_loss

LOSS_REGISTRY = {
    "Iterative": iterative_loss,
    "Linear": linear_loss,
}

__all__ = [
    "LossConfig",
    "focus_loss",
    "iwe_with_ts",
    "flow_spatial_smoothing",
    "flow_temporal_smoothing",
    "iterative_loss",
    "warp_table",
    "linear_loss",
    "LOSS_REGISTRY",
]
