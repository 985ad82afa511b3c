from .visualization import Visualization, flow_to_image, events_to_image, encode_dsec_flow, decode_dsec_flow

__all__ = [
    "Visualization",
    "flow_to_image",
    "events_to_image",
    "encode_dsec_flow",
    "decode_dsec_flow",
]
