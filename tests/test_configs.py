"""Config-system tests: defaults, merge precedence, param round-trip."""

import numpy as np
import yaml

from taming_event_flow_tpu.configs import YAMLParser
from taming_event_flow_tpu.configs.parser import deep_merge


def test_defaults_and_file_merge(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("data:\n  mode: time\n  window: 0.01\n")
    parser = YAMLParser(str(p))
    cfg = parser.config
    assert cfg["data"]["mode"] == "time"
    assert cfg["data"]["window"] == 0.01
    # untouched defaults survive
    assert cfg["loader"]["batch_size"] == 1
    assert cfg["optimizer"]["name"] == "Adam"


def test_deep_merge_nested():
    dst = {"a": {"b": 1, "c": 2}, "d": 3}
    deep_merge(dst, {"a": {"c": 9}, "e": 4})
    assert dst == {"a": {"b": 1, "c": 9}, "d": 3, "e": 4}


def test_merge_configs_precedence(tmp_path):
    """defaults < tracked train params < eval yaml (reference parser.py:113-129)."""
    eval_yml = tmp_path / "eval.yml"
    eval_yml.write_text(
        "data:\n  mode: gtflow\n  window: 1\nloader:\n  resolution: [260, 346]\n"
    )
    parser = YAMLParser(str(eval_yml))

    run_params = {
        "data": str({"mode": "time", "window": 0.01, "passes_loss": 10,
                     "scales_loss": 1, "voxel": None, "cache": False}),
        "loss": str({"warping": "Iterative", "flow_scaling": 32,
                     "iterative_mode": "two", "round_ts": False}),
        "model": str({"name": "RecEVFlowNet", "final_w_scale": 0.01}),
    }
    cfg = parser.merge_configs(run_params)
    # eval yaml wins
    assert cfg["data"]["mode"] == "gtflow"
    assert cfg["loader"]["resolution"] == [260, 346]
    # train params survive where eval is silent
    assert cfg["data"]["passes_loss"] == 10
    assert cfg["loss"]["flow_scaling"] == 32
    assert cfg["model"]["final_w_scale"] == 0.01


def test_merge_configs_rejects_code_injection(tmp_path):
    parser = YAMLParser()
    import pytest

    with pytest.raises((ValueError, SyntaxError)):
        parser.merge_configs({"data": "{__import__('os').system('true')}"})


def test_seeding(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("loader:\n  seed: 123\n")
    YAMLParser(str(p))
    a = np.random.rand()
    YAMLParser(str(p))
    b = np.random.rand()
    assert a == b


def test_apply_runtime_compilation_cache(tmp_path):
    import jax

    from taming_event_flow_tpu.configs import YAMLParser

    cache = tmp_path / "xla_cache"
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # a trivial CPU compile can finish under the default 0.1 s write
        # threshold — the persist-everything knob (what precompile.py uses)
        # makes the write-path assertion deterministic
        YAMLParser.apply_runtime(
            {"runtime": {"compilation_cache": str(cache),
                         "persistent_cache_min_compile_secs": 0.0}}
        )
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        f = jax.jit(lambda x: x * 2 + 1)
        f(np.ones((64, 64))).block_until_ready()
        assert cache.is_dir() and len(list(cache.iterdir())) >= 1
        # absent/None -> no-op
        YAMLParser.apply_runtime({})
        assert jax.config.jax_compilation_cache_dir == str(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)
