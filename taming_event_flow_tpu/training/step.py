"""Jitted TBPTT training step.

The reference accumulates 10 forward passes eagerly, calls the loss, and
backprops through the whole python history (reference
``train_flow.py:80-156``). Here the ENTIRE loss window is one compiled XLA
program: a ``lax.scan`` over the P passes runs the recurrent model and
collects flow maps, the contrast-max loss consumes the stacked sequence, and
one ``value_and_grad`` + optimizer update closes the step. Truncated BPTT
falls out of functional purity — the carry returned by the step is a plain
array, so the next window's gradient stops there exactly like the
reference's ``detach_states`` (``models/model.py:50-60``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..objectives import LossConfig, LOSS_REGISTRY


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    carry: Any  # model recurrent state, [B, ...] leaves (or empty tuple)
    step: jnp.ndarray


def build_optimizer(opt_config: Dict, clip_grad: Optional[float] = None):
    """Registry-based optimizer construction (replaces the reference's
    ``eval(config["optimizer"]["name"])`` dispatch, ``train_flow.py:70``).

    ``clip_grad`` reproduces ``clip_grad_norm_`` (``train_flow.py:127-129``).
    """
    name = opt_config.get("name", "Adam").lower()
    lr = opt_config.get("lr", 1e-5)
    table = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
    }
    if name not in table:
        raise ValueError(f"Unknown optimizer: {name!r}")
    tx = table[name](lr)
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx


def unpack_window(window: Dict[str, jnp.ndarray],
                  res: Optional[tuple] = None) -> Dict[str, jnp.ndarray]:
    """Device-side inverse of the packed wire format
    (:func:`taming_event_flow_tpu.training.window.stack_window` with
    ``packed=True``); identity (all casts no-ops) for a plain f32 window.

    Exactness: polarity is ±1/0 so int8 -> f32 is exact and the derived
    ``pol_mask`` ``[p>0, p<0]`` is the loader's own construction
    (``data/base.py assemble_sample``); ``grad_mask`` values are 0/1; a
    narrowed integer ``net_input`` is only shipped when the count
    encoding fits it exactly (``window.pack_net_input``) — or not shipped
    at all (``derive_net``), in which case the count encoding rebuilds
    from the event lists (+ optional raw coords / rectification gather
    index) via :func:`ops.encodings.derive_count_input`, the host
    loader's own construction. ``res`` is required only for that path.
    """
    if "event_txy" in window:
        p = window["event_p"].astype(jnp.float32)
        event_list = jnp.concatenate(
            [window["event_txy"], p[..., None]], axis=-1
        )
        if "net_input" in window:
            net = window["net_input"]
        else:
            from taming_event_flow_tpu.ops.encodings import (
                derive_count_input,
            )

            raw = window.get("event_raw_xy")
            net = derive_count_input(
                event_list, res, raw_xy=raw,
                remap_idx=window.get("remap_idx"),
            )
        window = {
            "net_input": net,
            "event_list": event_list,
            "pol_mask": jnp.stack([p > 0, p < 0], axis=-1),
            "grad_mask": window["grad_mask"],
        }
    return {
        "net_input": window["net_input"].astype(jnp.float32),
        "event_list": window["event_list"],
        "pol_mask": window["pol_mask"].astype(jnp.float32),
        "grad_mask": window["grad_mask"].astype(jnp.float32),
    }


def make_train_step(model, optimizer, loss_cfg: LossConfig,
                    warping: str = "Iterative", flow_scaling: float = 32.0,
                    donate: bool = True,
                    res: Optional[tuple] = None) -> Callable:
    """Build the jitted window step.

    Returned signature::

        new_state, loss = step(state, window)

    with ``window`` a dict of pass-stacked arrays:
      * ``net_input``: ``[P, B, H, W, C]``
      * ``event_list``: ``[P, B, N, 4]`` (ts, y, x, p), ts in [0, 1]
      * ``pol_mask``: ``[P, B, N, 2]``
      * ``grad_mask``: ``[P, B, N, 1]``
    or the packed wire equivalent (see :func:`unpack_window`).
    """
    loss_fn = LOSS_REGISTRY[warping]

    def step(state: TrainState, raw_window: Dict[str, jnp.ndarray]):
        window = unpack_window(raw_window, res=res)
        def compute_loss(params):
            def body(carry, inp):
                x = inp
                flows, new_carry = model.apply(
                    {"params": params}, x, carry
                )
                return new_carry, flows * flow_scaling

            new_carry, flows = jax.lax.scan(
                body, state.carry, window["net_input"],
                unroll=loss_cfg.scan_unroll,
            )  # flows: [P, S, B, H, W, 2]
            loss = loss_fn(
                flows,
                window["event_list"],
                window["pol_mask"],
                window["grad_mask"],
                loss_cfg,
            )
            return loss, new_carry

        (loss, new_carry), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, new_carry, state.step + 1),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_forward_fn(model, flow_scaling: float = 32.0) -> Callable:
    """Jitted single-pass inference: ``(params, carry, x) -> (flows, carry)``."""

    @jax.jit
    def forward(params, carry, x):
        flows, new_carry = model.apply({"params": params}, x, carry,
                                       train=False)
        return flows * flow_scaling, new_carry

    return forward


def make_eval_step(model, val, flow_scaling: float = 32.0,
                   inference_dtype=None,
                   extras: Optional[Callable] = None) -> Callable:
    """Fused inference pass: model forward + validation update in ONE jitted
    program per occupied-slot count, with the recurrent carry and the slot
    state donated.

    Splitting forward and update into two dispatches costs a host round
    trip and re-allocates the carry every pass — fusing them measured
    12.0 -> 8.3 ms/pass at the DSEC 480x640 protocol. Returned signature::

        vstate, carry, flow_fine = step(vstate, carry, params, x,
                                        ev, pol, emask, n_active=k)

    ``val`` is an ``IterativeValidation``/``LinearValidation`` instance.

    :param inference_dtype: optional reduced dtype (e.g. ``jnp.bfloat16``)
        for the model forward only — params/carry/input cast in, flow maps
        cast back to f32 before the validation update (the warp pipeline
        stays full precision). Measured 6.6 -> 5.9 ms at 480x640 with
        <=0.14 px flow perturbation; run the AEE study
        (``scripts/study_bf16_eval.py``) before enabling on a protocol.
    :param extras: optional ``(updated_vstate, aux) -> pytree`` of
        window-boundary quantities, fused into the pass program ON REQUEST
        (``step(..., aux=gt, with_extras=True)`` returns a 4th value). The
        caller picks per dispatch — e.g. only on boundary passes inside an
        ``eval_time`` gate — so gated-out passes pay nothing. One compiled
        specialization per (n_active, with_extras) pair.
    """
    import functools

    cache = {}

    def body(k, want, vstate, carry, params, x, ev, pol, emask, aux=None,
             raw=None, ridx=None):
        # packed wire (all no-ops / dead branches for plain f32 inputs):
        # narrowed count net inputs cast up — or a None x derives the
        # count encoding from the event list (+ optional raw coords /
        # rectification gather index), the loader's construction
        # (ops/encodings.derive_count_input); a None pol derives
        # [p>0, p<0] from the event list (ditto); a None emask derives
        # (cnt_pos + cnt_neg) > 0 from the count encoding (ditto)
        if x is None:
            from taming_event_flow_tpu.ops.encodings import (
                derive_count_input,
            )

            x = derive_count_input(ev, val.cfg.res, raw_xy=raw,
                                   remap_idx=ridx)
        x = x.astype(jnp.float32)
        if pol is None:
            p = ev[..., 3]
            pol = jnp.stack([p > 0, p < 0], axis=-1)
        pol = pol.astype(jnp.float32)
        if emask is None:
            emask = (
                jnp.sum(x, axis=-1, keepdims=True) > 0
            ).astype(jnp.float32)
        if inference_dtype is not None:
            params = jax.tree.map(
                lambda p: p.astype(inference_dtype), params
            )
            carry = jax.tree.map(
                lambda c: c.astype(inference_dtype), carry
            )
            x = x.astype(inference_dtype)
        flows, new_carry = model.apply({"params": params}, x, carry,
                                       train=False)
        flow_fine = flows[-1].astype(jnp.float32) * flow_scaling
        vs = val.update(vstate, flow_fine, ev, pol, emask, n_active=k)
        if want:
            return vs, new_carry, flow_fine, extras(vs, aux)
        return vs, new_carry, flow_fine

    def step(vstate, carry, params, x, ev, pol, emask, n_active,
             aux=None, with_extras=False, raw=None, ridx=None):
        want = bool(with_extras and extras is not None)
        fn = cache.get((n_active, want))
        if fn is None:
            fn = jax.jit(functools.partial(body, n_active, want),
                         donate_argnums=(0, 1))
            cache[(n_active, want)] = fn
        if want:
            return fn(vstate, carry, params, x, ev, pol, emask, aux,
                      raw, ridx)
        return fn(vstate, carry, params, x, ev, pol, emask, raw=raw,
                  ridx=ridx)

    return step


def make_eval_window_step(model, val, flow_scaling: float = 32.0,
                          inference_dtype=None,
                          reset_first: bool = False,
                          extras: Optional[Callable] = None) -> Callable:
    """Whole-window inference: ALL P fused (forward + update) pass bodies
    of :func:`make_eval_step`, python-unrolled inside ONE jitted program.

    Per-pass dispatch makes eval latency hostage to host CPU contention
    (measured ±20% pass-to-pass jitter on a busy 1-core host); recorded
    protocols (DSEC/MVSEC gtflow windows) have every pass of a GT window
    available up front, so one dispatch per window amortizes that host
    cost P×. The unrolled bodies keep the SAME static ``n_active`` slot
    slicing as the per-pass specializations — device work is identical,
    and the result is bit-identical to P sequential ``make_eval_step``
    calls (tested, ``tests/test_training.py``).

    Returned signature (``vstate`` must be fresh — ``pass_idx == 0``)::

        vstate, carry, flow_fine_last = window(vstate, carry, params,
                                               xs, evs, pols, emasks)

    with pass-stacked inputs ``xs [P,B,H,W,C]``, ``evs [P,B,N,4]``,
    ``pols [P,B,N,2]``, ``emasks [P,B,H,W,1]``. ``flow_fine_last`` is the
    final pass's finest-scale flow (f32, flow_scaling'd).

    :param inference_dtype: same contract as :func:`make_eval_step`.
    :param reset_first: fold the window-boundary state reset into the
        program (``vstate`` may then be the PREVIOUS window's stale state).
        Saves the separate reset dispatch, and XLA dead-code-eliminates
        the zeroing of every slot buffer the window fully overwrites.
        Idempotent on an already-fresh state.
    :param extras: optional ``(final_vstate, aux) -> pytree`` computing
        window-boundary quantities (metric scalars, the accumulated
        backward flow map) INSIDE the program. One dispatch and a scalar
        readback replace the separate post-window reducer dispatches that
        otherwise serialize with the host (measured ~2 s/window of
        blocking on the tunneled dev TPU). The signature grows a trailing
        ``aux`` argument (e.g. the window's GT flow; pass ``0.0`` when
        unused) and a 4th return value.
    """
    passes = val.cfg.passes

    def window(vstate, carry, params, xs, evs, pols, emasks, aux=None,
               raw=None, ridx=None):
        if reset_first:
            vstate = val.reset(vstate)
        if isinstance(evs, dict):
            # u32-packed event wire (ops/encodings.unpack_event_wire):
            # one u32 element carries (y, x, polarity); rectified
            # sequences additionally gather the fractional coordinates
            # from the sequence's forward map on device — bitwise the
            # host lookup's values. ``raw`` only matters when the event
            # list carries rectified coords (the count encoding then
            # derives from the raw integers).
            from taming_event_flow_tpu.ops.encodings import (
                unpack_event_wire,
            )

            rect = evs.get("rect")
            evs, raw_unpacked = unpack_event_wire(
                evs["ts"], evs["yxp"], rect)
            if rect is not None:
                raw = raw_unpacked
        # packed wire formats from the staging producer: count-encoding
        # net inputs travel narrowed (integer counts by construction,
        # data/base.py) — or, with xs None, don't travel at all and
        # derive from the event lists (+ optional raw coords /
        # rectification gather index: ops/encodings.derive_count_input,
        # the loader's construction — ~6 MB/window at DSEC scale); a
        # None pols derives [p>0, p<0] from the event lists (ditto)
        # instead of shipping 2.6 MB/window; a None emasks derives
        # (cnt_pos + cnt_neg) > 0 from the count encoding (ditto, 12
        # MB/window at DSEC scale). All casts are no-ops for plain f32
        # inputs; xs casts BEFORE the mask derivation so the narrowed
        # path is element-for-element the f32 one.
        if xs is None:
            from taming_event_flow_tpu.ops.encodings import (
                derive_count_input,
            )

            xs = derive_count_input(evs, val.cfg.res, raw_xy=raw,
                                    remap_idx=ridx)
        if pols is None:
            p = evs[..., 3]
            pols = jnp.stack([p > 0, p < 0], axis=-1)
        pols = pols.astype(jnp.float32)
        xs = xs.astype(jnp.float32)
        if emasks is None:
            emasks = (
                jnp.sum(xs, axis=-1, keepdims=True) > 0
            ).astype(jnp.float32)
        if inference_dtype is not None:
            params = jax.tree.map(
                lambda p: p.astype(inference_dtype), params
            )
        flow_fine = None
        for k in range(passes):
            x, c = xs[k], carry
            if inference_dtype is not None:
                x = x.astype(inference_dtype)
                c = jax.tree.map(lambda t: t.astype(inference_dtype), c)
            flows, carry = model.apply({"params": params}, x, c,
                                       train=False)
            flow_fine = flows[-1].astype(jnp.float32) * flow_scaling
            vstate = val.update(vstate, flow_fine, evs[k], pols[k],
                                emasks[k], n_active=k + 1)
        if extras is not None:
            return vstate, carry, flow_fine, extras(vstate, aux)
        return vstate, carry, flow_fine

    return jax.jit(window, donate_argnums=(0, 1))


@jax.jit
def reset_carry(carry, reset_mask):
    """Zero the recurrent state of flagged batch lanes.

    ``reset_mask``: ``[B]`` bool. The reference resets ALL lanes on any
    sequence change (``train_flow.py:83-87``); per-lane zeroing is the
    batched generalization.
    """
    def zero(leaf):
        m = reset_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, jnp.zeros_like(leaf), leaf)

    return jax.tree.map(zero, carry)


def init_train_state(model, optimizer, batch: int, height: int, width: int,
                     num_bins: int, rng_key=None) -> TrainState:
    """Fresh params + optimizer state + zero carry."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, height, width, num_bins))
    carry = model.init_state(batch, height, width)
    params = model.init(rng_key, x, carry)["params"]
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, carry, jnp.zeros((), jnp.int32))
