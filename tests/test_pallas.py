"""Fused Pallas splat/gather kernels match the XLA paths — values AND
gradients (custom VJP vs autodiff), bilinear and nearest modes, single- and
multi-tile maps (interpret mode off-TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.ops import (
    gather_values,
    splat_values,
    set_warp_backend,
)

SHAPES = [
    ((8, 10), 32),  # tiny, single tile
    ((140, 200), 256),  # > 16384 px: XLA path is the 4-tap scatter; 2x2 tiles
]


@pytest.fixture
def backends():
    yield
    set_warp_backend("auto")


def make_events(rng, res, m, b=2, c=3, integers=True):
    loc = np.stack(
        [
            rng.uniform(-2, res[0] + 1, (b, m)),  # includes out-of-frame
            rng.uniform(-2, res[1] + 1, (b, m)),
        ],
        axis=-1,
    ).astype(np.float32)
    if integers:
        # exactly-integer coords exercise stencil tie conventions (values
        # agree across backends; loc-subgradients there are convention
        # choices — see grad tests)
        loc[:, : m // 4] = np.round(loc[:, : m // 4])
    vals = rng.normal(size=(b, m, c)).astype(np.float32)
    # zero-masked padding rows like the loader contract
    vals[:, -m // 8 :] = 0.0
    return jnp.asarray(loc), jnp.asarray(vals)


@pytest.mark.parametrize("res,m", SHAPES)
@pytest.mark.parametrize("round_idx", [False, True])
def test_splat_matches_xla(rng, backends, res, m, round_idx):
    loc, vals = make_events(rng, res, m)
    set_warp_backend("xla")
    ref = np.asarray(splat_values(loc, vals, res, round_idx=round_idx))
    set_warp_backend("pallas")
    out = np.asarray(splat_values(loc, vals, res, round_idx=round_idx))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("res,m", SHAPES)
def test_gather_matches_xla(rng, backends, res, m):
    loc, _ = make_events(rng, res, m)
    maps = jnp.asarray(rng.normal(size=(2, res[0], res[1], 3)), jnp.float32)
    set_warp_backend("xla")
    ref = np.asarray(gather_values(maps, loc))
    set_warp_backend("pallas")
    out = np.asarray(gather_values(maps, loc))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# Gradient notes: at exactly-integer coordinates the loc-gradient is a
# subgradient choice. The dense stencil (separable/pallas) sees three taps
# (dtri = -0.5·g[y+1] ... +0.5·g[y-1]) while the 4-tap scatter path only
# materializes floor(y)/floor(y)+1. Warped locations are non-integer except
# on a measure-zero set, and the gradient path to flow maps (d_maps) is
# convention-independent — so grad tests use non-integer coords.


@pytest.mark.parametrize("res,m", SHAPES)
def test_splat_grads_match_xla(rng, backends, res, m):
    loc, vals = make_events(rng, res, m, integers=False)
    cot = jnp.asarray(rng.normal(size=(2, res[0], res[1], 3)), jnp.float32)

    def loss(loc, vals):
        return jnp.sum(splat_values(loc, vals, res) * cot)

    set_warp_backend("xla")
    ref_dl, ref_dv = jax.grad(loss, argnums=(0, 1))(loc, vals)
    set_warp_backend("pallas")
    dl, dv = jax.grad(loss, argnums=(0, 1))(loc, vals)
    np.testing.assert_allclose(
        np.asarray(dv), np.asarray(ref_dv), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dl), np.asarray(ref_dl), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("res,m", SHAPES)
def test_gather_grads_match_xla(rng, backends, res, m):
    loc, _ = make_events(rng, res, m, integers=False)
    maps = jnp.asarray(rng.normal(size=(2, res[0], res[1], 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(2, m, 3)), jnp.float32)

    def loss(maps, loc):
        return jnp.sum(gather_values(maps, loc) * cot)

    set_warp_backend("xla")
    ref_dm, ref_dl = jax.grad(loss, argnums=(0, 1))(maps, loc)
    set_warp_backend("pallas")
    dm, dl = jax.grad(loss, argnums=(0, 1))(maps, loc)
    np.testing.assert_allclose(
        np.asarray(dm), np.asarray(ref_dm), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dl), np.asarray(ref_dl), rtol=1e-5, atol=1e-4
    )


def test_iterative_loss_value_and_grad_under_pallas(rng, backends):
    """The full training loss is backend-invariant (value + flow grads)."""
    from taming_event_flow_tpu.objectives import LossConfig, iterative_loss

    res, p, b, n, s = (8, 10), 3, 1, 16, 1
    flows = jnp.asarray(
        rng.normal(size=(p, s, b, res[0], res[1], 2)), jnp.float32
    )
    ev = np.zeros((p, b, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (p, b, n))
    ev[:, :, 0, 0] = 0.0
    ev[..., 1] = rng.integers(0, res[0], (p, b, n))
    ev[..., 2] = rng.integers(0, res[1], (p, b, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (p, b, n))
    pol = jnp.asarray(
        np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1), jnp.float32
    )
    gm = jnp.ones((p, b, n, 1), jnp.float32)
    ev = jnp.asarray(ev)
    cfg = LossConfig(res=res, passes_loss=p, scales_loss=1)

    def f(fl):
        return iterative_loss(fl, ev, pol, gm, cfg)

    set_warp_backend("xla")
    ref_v, ref_g = jax.value_and_grad(f)(flows)
    set_warp_backend("pallas")
    v, g = jax.value_and_grad(f)(flows)
    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(ref_g), rtol=1e-4, atol=1e-5
    )
