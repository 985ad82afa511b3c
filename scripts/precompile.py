"""Precompile a protocol's jitted programs into the persistent XLA cache.

Cold-start problem: the windowed train/eval programs compile for minutes on
a fresh machine (200-340 s measured on this host for the DSEC eval window
program). The persistent compilation cache (``runtime.compilation_cache``)
eliminates repeats — but only after something has compiled the programs
once. This script is that something: it drives the REAL CLIs
(``train_flow.train`` / ``eval_flow.test``) over a throwaway synthetic
dataset whose loader shapes match the protocol exactly, so every program a
real run compiles — window step, in-program metrics, state init, reducers —
lands in the cache under its real key (same factories, same donation flags,
same shapes ⇒ same HLO ⇒ same cache key).

Usage::

    # prime the DSEC submission protocol's eval programs
    python scripts/precompile.py --eval configs/eval_dsec.yml \
        --cache /tmp/xla_cache

    # prime the training programs too
    python scripts/precompile.py --train configs/train_flow.yml \
        --eval configs/eval_dsec.yml --cache /tmp/xla_cache

Notes:
  * Program shapes follow the config: ``loader.resolution``,
    ``loader.n_events_pad``, ``data.passes_loss``, batch size, metric and
    vis selections. Protocols WITHOUT a static ``loader.n_events_pad``
    bucket their event axis to per-window power-of-two sizes — those
    programs can only be primed for the buckets the synthetic data happens
    to hit; set ``n_events_pad`` (recommended anyway) for exact priming.
  * The eval pass needs a tracked run to reconstruct the train config from;
    a 1-epoch miniature training run (32x32, the --train config's model/
    loss sections verbatim) provides it. Its programs are tiny and compile
    in seconds; its tracked params carry the real model hyperparameters so
    the eval-side reconstruction matches a real run's.
  * Everything runs in ONE process (single TPU attach on the tunneled
    plugin, CLAUDE.md).

Verified by ``tests/test_precompile.py``: a second process re-running the
eval CLI at the same shapes adds ZERO new cache entries — every compile is
a hit.
"""

import argparse
import copy
import os
import shutil
import sys
import tempfile
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cache_entries(cache_dir):
    if not os.path.isdir(cache_dir):
        return set()
    return set(os.listdir(cache_dir))


def _write_cfg(path, cfg):
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _make_dataset(root, res, n_files, n_flow_frames=4, n_events=4000):
    from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

    ds = os.path.join(root, "data")
    for i in range(n_files):
        write_synthetic_h5(
            os.path.join(ds, f"seq{i}.h5"), n_events=n_events, res=res,
            n_flow_frames=n_flow_frames, seed=i + 1,
        )
    return ds


def precompile_train(train_cfg_path, cache_dir, workdir):
    """One optimizer step of the real training program at the config's
    shapes (+ carry reset / window stack paths)."""
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    parser = YAMLParser(train_cfg_path)
    cfg = copy.deepcopy(parser.config)
    res = tuple(cfg["loader"]["resolution"])
    batch = cfg["loader"]["batch_size"]
    ds = _make_dataset(os.path.join(workdir, "train"), res,
                       n_files=max(2, batch))
    cfg["data"] = dict(cfg["data"], path=ds, cache=False)
    cfg["loader"] = dict(cfg["loader"], n_epochs=1,
                         seed=cfg["loader"].get("seed") or 0)
    cfg["vis"] = dict(cfg.get("vis", {}), verbose=False, enabled=False,
                      store=False)
    cfg["runtime"] = dict(cfg.get("runtime") or {},
                          compilation_cache=cache_dir,
                          persistent_cache_min_compile_secs=0.0)
    cfg_path = _write_cfg(os.path.join(workdir, "train_precompile.yml"), cfg)

    args = argparse.Namespace(config=cfg_path, path_mlflow=workdir,
                              path_cache="", prev_runid="")
    t0 = time.time()
    runid = train_flow.train(args, YAMLParser(cfg_path))
    print(f"[precompile] train programs compiled in {time.time() - t0:.1f}s "
          f"(run {runid})")
    return runid


def precompile_eval(eval_cfg_path, train_cfg_path, cache_dir, workdir,
                    runid=None):
    """The eval CLI's full program set at the protocol's shapes."""
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow
    import train_flow

    if runid is None:
        # miniature tracked run: tiny shapes (the eval overrides them), the
        # real model/loss sections (the eval reconstructs them from here)
        parser = YAMLParser(train_cfg_path)
        cfg = copy.deepcopy(parser.config)
        ds = _make_dataset(os.path.join(workdir, "seedrun"), (32, 32),
                           n_files=2, n_events=2000)
        cfg["data"] = dict(cfg["data"], path=ds, mode="time", window=0.2,
                           passes_loss=2, cache=False)
        cfg["loader"] = dict(cfg["loader"], n_epochs=1, batch_size=1,
                             resolution=[32, 32], n_events_pad=None,
                             seed=0)
        cfg["vis"] = dict(cfg.get("vis", {}), verbose=False, enabled=False,
                          store=False)
        cfg.pop("runtime", None)  # tiny programs: skip cache writes
        cfg_path = _write_cfg(os.path.join(workdir, "seedrun.yml"), cfg)
        args = argparse.Namespace(config=cfg_path, path_mlflow=workdir,
                                  path_cache="", prev_runid="")
        runid = train_flow.train(args, YAMLParser(cfg_path))

    eparser = YAMLParser(eval_cfg_path)
    ecfg = copy.deepcopy(eparser.config)
    res = tuple(ecfg["loader"]["resolution"])
    # ONE gt window per file is enough: every program the steady-state loop
    # uses compiles on the first window
    ds = _make_dataset(os.path.join(workdir, "eval"), res, n_files=1,
                       n_flow_frames=3, n_events=6000)
    ecfg["data"] = dict(ecfg["data"], path=ds, cache=False)
    ecfg["runtime"] = dict(ecfg.get("runtime") or {},
                           compilation_cache=cache_dir,
                           persistent_cache_min_compile_secs=0.0)
    ecfg_path = _write_cfg(os.path.join(workdir, "eval_precompile.yml"),
                           ecfg)
    args = argparse.Namespace(
        runid=runid, config=ecfg_path, path_mlflow=workdir,
        path_results=os.path.join(workdir, "results") + "/",
    )
    t0 = time.time()
    eval_flow.test(args, YAMLParser(ecfg_path))
    print(f"[precompile] eval programs compiled in {time.time() - t0:.1f}s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default=None,
                    help="training config to precompile (e.g. "
                         "configs/train_flow.yml)")
    ap.add_argument("--eval", dest="eval_cfg", default=None,
                    help="eval config to precompile (e.g. "
                         "configs/eval_dsec.yml)")
    ap.add_argument("--model-from", default="configs/train_flow.yml",
                    help="train config whose model/loss sections seed the "
                         "eval-side tracked run (default: the flagship)")
    ap.add_argument("--cache", default="/tmp/xla_cache",
                    help="persistent compilation cache directory")
    ap.add_argument("--workdir", default=None,
                    help="scratch directory (default: temp, deleted unless "
                         "--keep)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the scratch directory")
    args = ap.parse_args(argv)
    if not args.train and not args.eval_cfg:
        ap.error("nothing to do: pass --train and/or --eval")

    workdir = args.workdir or tempfile.mkdtemp(prefix="precompile_")
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(args.cache, exist_ok=True)

    # Persist EVERY compile, including sub-0.1s op-dispatch programs. The
    # default min-compile-time threshold makes borderline (~0.1s) compiles
    # flip between written/not-written across runs under host load — a
    # primed cache must be complete so later runs are pure hits.
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    before = _cache_entries(args.cache)
    t0 = time.time()
    try:
        runid = None
        if args.train:
            runid = precompile_train(args.train, args.cache, workdir)
        if args.eval_cfg:
            precompile_eval(args.eval_cfg, args.train or args.model_from,
                            args.cache, workdir)
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)
    after = _cache_entries(args.cache)
    print(
        f"[precompile] done in {time.time() - t0:.1f}s: "
        f"{len(after - before)} new cache entries "
        f"({len(after)} total) in {args.cache}"
    )


if __name__ == "__main__":
    main()
