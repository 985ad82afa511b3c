"""taming_event_flow_tpu — a TPU-native (JAX/XLA/Pallas) framework for
self-supervised, sequential event-camera optical flow via multi-reference
iterative contrast maximization.

Re-designed from scratch for TPU hardware with the capabilities of the
ICCV'23 reference implementation "Taming Contrast Maximization for Learning
Sequential, Low-latency, Event-based Optical Flow" (tudelft/taming_event_flow).

Conventions (differ deliberately from the torch reference — TPU-first):
  * images / flow maps are NHWC (``[B, H, W, C]``); flow channel order is
    (x, y) like the reference's channel dim.
  * event lists are ``[B, N, 4]`` with columns ``(ts, y, x, p)``; ragged event
    windows are zero-padded to a static N, with a ``[B, N, 2]`` polarity mask
    that is zero for padding (padding therefore never contributes to any
    image of warped events, matching the reference's collate contract,
    reference ``dataloader/base.py:391-434``).
  * everything on the device path is a pure function of explicit state.
"""

__version__ = "0.1.0"
