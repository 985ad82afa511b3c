from .model import RecEVFlowNet, EVFlowNet, build_model
from .unet import MultiResUNetRecurrent, MultiResUNet

__all__ = [
    "RecEVFlowNet",
    "EVFlowNet",
    "build_model",
    "MultiResUNetRecurrent",
    "MultiResUNet",
]
