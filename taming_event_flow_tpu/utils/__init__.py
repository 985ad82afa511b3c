from .visualization import Visualization, flow_to_image, events_to_image, encode_dsec_flow, decode_dsec_flow
from .progress import ProgressBar, StepMeter
from .diagnostics import save_diff, profile_trace, annotate

__all__ = [
    "Visualization",
    "flow_to_image",
    "events_to_image",
    "encode_dsec_flow",
    "decode_dsec_flow",
    "ProgressBar",
    "StepMeter",
    "save_diff",
    "profile_trace",
    "annotate",
]
