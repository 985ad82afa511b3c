from .warp import (
    event_propagation,
    bilinear_sample,
    get_event_flow,
    purge_unfeasible,
    get_interpolation,
    interpolate,
    splat_bilinear,
    iwe_from_events,
    deblur_events,
    compute_pol_iwe,
)
from .encodings import (
    events_to_image,
    events_to_voxel,
    events_to_channels,
)

__all__ = [
    "event_propagation",
    "bilinear_sample",
    "get_event_flow",
    "purge_unfeasible",
    "get_interpolation",
    "interpolate",
    "splat_bilinear",
    "iwe_from_events",
    "deblur_events",
    "compute_pol_iwe",
    "events_to_image",
    "events_to_voxel",
    "events_to_channels",
]
