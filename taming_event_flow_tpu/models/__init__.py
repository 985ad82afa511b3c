from .model import RecEVFlowNet, EVFlowNet, build_model
from .fire import RecFireFlowNet, FireFlowNet
from .unet import MultiResUNetRecurrent, MultiResUNet

__all__ = [
    "RecEVFlowNet",
    "EVFlowNet",
    "RecFireFlowNet",
    "FireFlowNet",
    "build_model",
    "MultiResUNetRecurrent",
    "MultiResUNet",
]
