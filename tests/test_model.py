"""Model tests: shapes, carry semantics, param-count and forward parity
with the torch reference via checkpoint porting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.models import RecEVFlowNet, EVFlowNet, build_model
from taming_event_flow_tpu.models.port import torch_state_dict_to_flax

from .oracle import requires_reference

H, W = 24, 40  # deliberately not multiples of 16 to exercise padding


@pytest.fixture(scope="module")
def model_and_params():
    model = RecEVFlowNet(num_bins=2)
    x = jnp.zeros((1, H, W, 2))
    state = model.init_state(1, H, W)
    params = model.init(jax.random.PRNGKey(0), x, state)["params"]
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    x = jnp.ones((2, H, W, 2))
    state = model.init_state(2, H, W)
    flows, new_state = model.apply({"params": params}, x, state)
    assert flows.shape == (4, 2, H, W, 2)
    assert len(new_state) == 4
    # carry spatial dims follow the padded input (32 x 48)
    assert new_state[0].shape == (2, 16, 24, 64)
    assert new_state[3].shape == (2, 2, 3, 512)


def test_recurrence_changes_output(model_and_params):
    model, params = model_and_params
    x = jnp.ones((1, H, W, 2))
    state = model.init_state(1, H, W)
    f1, state1 = model.apply({"params": params}, x, state)
    f2, _ = model.apply({"params": params}, x, state1)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    # zero state resets exactly
    f1b, _ = model.apply({"params": params}, x, model.init_state(1, H, W))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f1b))


def test_stateless_evflownet():
    model = EVFlowNet(num_bins=2)
    x = jnp.ones((1, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    flows, state = model.apply({"params": params}, x)
    assert flows.shape == (4, 1, H, W, 2)
    assert state == ()


def test_build_model_dispatch():
    m = build_model({"name": "RecEVFlowNet", "final_w_scale": 0.01}, num_bins=5)
    assert isinstance(m, RecEVFlowNet)
    assert m.num_bins == 5 and m.final_w_scale == 0.01
    with pytest.raises(ValueError):
        build_model({"name": "__import__"})


@requires_reference
def test_param_count_parity(model_and_params):
    import torch
    from models.model import RecEVFlowNet as RefModel

    _, params = model_and_params
    ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    ref_model = RefModel({}, num_bins=2)
    ref = sum(p.numel() for p in ref_model.parameters() if p.requires_grad)
    assert ours == ref


@requires_reference
def test_forward_parity_via_checkpoint_port(rng):
    """Port torch weights into flax; recurrent forward must match over 3 steps."""
    import torch
    from models.model import RecEVFlowNet as RefModel

    torch.manual_seed(0)
    ref_model = RefModel({}, num_bins=2).eval()
    state_dict = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }
    params = torch_state_dict_to_flax(state_dict)

    model = RecEVFlowNet(num_bins=2)
    state = model.init_state(1, H, W)
    ref_model.reset_states()

    for step in range(3):
        x = rng.normal(size=(1, H, W, 2)).astype(np.float32)
        flows, state = model.apply({"params": params}, jnp.asarray(x), state)

        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(np.moveaxis(x, -1, 1)))
        for i in range(4):
            ref_flow = np.moveaxis(ref_out["flow"][i].numpy(), 1, -1)
            np.testing.assert_allclose(
                np.asarray(flows[i]), ref_flow, atol=2e-5, rtol=1e-4,
                err_msg=f"step {step} scale {i}",
            )


def test_fire_flow_net_variants():
    from taming_event_flow_tpu.models import RecFireFlowNet, build_model

    model = build_model(
        {"name": "RecFireFlowNet", "base_channels": 8,
         "final_w_scale": 0.01, "num_encoders": 4}, num_bins=2,
    )
    assert isinstance(model, RecFireFlowNet)
    x = jnp.ones((1, 16, 20, 2))
    state = model.init_state(1, 16, 20)
    params = model.init(jax.random.PRNGKey(0), x, state)["params"]
    flows, new_state = model.apply({"params": params}, x, state)
    assert flows.shape == (1, 1, 16, 20, 2)
    assert new_state[0].shape == (1, 16, 20, 8)
    # recurrence carries information
    f2, _ = model.apply({"params": params}, x, new_state)
    assert not np.allclose(np.asarray(flows), np.asarray(f2))

    ff = build_model({"name": "FireFlowNet", "base_channels": 8}, num_bins=2)
    params2 = ff.init(jax.random.PRNGKey(0), x)["params"]
    flows2, st = ff.apply({"params": params2}, x)
    assert flows2.shape == (1, 1, 16, 20, 2) and st == ()


def test_bf16_compute_dtype_scan_stable(rng):
    """bf16 compute: flows come back f32 and close to the f32 model; the
    carry keeps a stable pytree/dtype structure so lax.scan accepts it
    (the TBPTT step scans the model over the pass axis)."""
    import jax.numpy as jnp

    kwargs = dict(num_bins=2, base_channels=8, num_encoders=2,
                  num_residual_blocks=1, min_size=4)
    m32 = RecEVFlowNet(**kwargs)
    mbf = RecEVFlowNet(**kwargs, compute_dtype="bfloat16")
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 2)), jnp.float32)
    carry = m32.init_state(1, 16, 16)
    params = m32.init(jax.random.PRNGKey(0), x, carry)["params"]

    f32_flows, _ = m32.apply({"params": params}, x, carry)
    bf_flows, bf_carry = mbf.apply({"params": params}, x, carry)
    assert bf_flows.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(bf_flows)))
    np.testing.assert_allclose(
        np.asarray(bf_flows), np.asarray(f32_flows), atol=0.05
    )
    # second step with the returned carry: structure/dtype must be stable
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(bf_carry)):
        assert a.shape == b.shape
    bf_flows2, _ = mbf.apply({"params": params}, x, bf_carry)
    assert np.all(np.isfinite(np.asarray(bf_flows2)))

    def scan_two(c, xs):
        import jax as _jax

        def body(cc, xx):
            fl, nc = mbf.apply({"params": params}, xx, cc)
            return nc, fl

        return _jax.lax.scan(body, c, xs)

    xs = jnp.stack([x, x], axis=0)
    _, fl = jax.jit(scan_two)(carry, xs)
    assert np.all(np.isfinite(np.asarray(fl)))
