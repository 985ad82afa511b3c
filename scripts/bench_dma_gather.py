"""The VERDICT-r4 gather experiment: can an explicit DMA-pipelined Pallas
row fetch beat XLA's gather row rate?

Context (README round-4 roofline): the training step's warp-table flow
sampling and the DSEC eval's packed-patch fetch are bound by XLA's gather
row rate — measured ~180-320 M rows/s at 480x640 regardless of row width
(8 or 128 lanes), leaving ~48 ms of the 222 ms train step on that floor.
The round-4 verdict's open question: is that an *XLA* artifact a
hand-rolled Pallas kernel with explicit HBM->VMEM DMA pipelining could
beat, or the hardware's own scattered-row ceiling?

This script measures exactly that, on the chip:

  * baseline — ``jnp.take_along_axis`` over a ``[1, R, W]`` table (the
    packed-patch formulation of ``ops/warp.py:_gather_patch_fwd``);
  * ``dma``  — a Pallas kernel that issues one HBM->VMEM DMA per row,
    ``DEPTH``-deep pipelined ring of semaphores, landing rows directly in
    the output block (no staging copy);
  * ``dma_batched`` — same, but each DMA fetches ``SPAN`` consecutive
    output rows' worth from scattered sources (ruled out: sources are
    scattered, so SPAN=1 is forced — kept as a sweep axis for issue-rate
    vs transfer-size attribution via CONTIGUOUS index streams).

Row rate is DMA-ISSUE bound for scattered 32-512 B rows: every row costs
one descriptor no matter its width, so rows/s directly measures the
per-descriptor overhead the hardware+runtime can sustain. If that number
lands under the XLA baseline, the "structural at B=8" claim in the README
is proven at the alternative's own ceiling; if over, ``ops/warp.py`` gets
a new backend.

Usage (single TPU process — do not run while another holds the chip)::

    python scripts/bench_dma_gather.py [--rows 307200] [--width 8]
                                       [--m 655360] [--depth 8]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    np.asarray(jax.device_get(x.ravel()[:1]))


def dma_gather(table, idx, depth: int = 8, block: int = 512):
    """``out[m, :] = table[idx[m], :]`` via per-row DMAs.

    :param table: ``[R, W]`` f32 (HBM-resident inside the kernel).
    :param idx: ``[M]`` int32, M a multiple of ``block``.
    :param depth: DMA pipeline depth (ring of semaphores).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    w = table.shape[1]
    assert m % block == 0

    def kernel(idx_ref, hbm_ref, o_ref, sems):
        i = pl.program_id(0)

        def make(k):
            src = hbm_ref.at[pl.ds(idx_ref[i * block + k], 1), :]
            dst = o_ref.at[pl.ds(k, 1), :]
            return pltpu.make_async_copy(src, dst, sems.at[k % depth])

        for k in range(depth):
            make(k).start()

        def body(k, carry):
            make(k).wait()

            @pl.when(k + depth < block)
            def _():
                make(k + depth).start()

            return carry

        jax.lax.fori_loop(0, block, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, w), lambda i, idx: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=307200)  # 480*640
    ap.add_argument("--width", type=int, default=8)  # packed patch 4C, C=2
    ap.add_argument("--m", type=int, default=655360)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(args.rows, args.width)), jnp.float32)
    idx_scattered = jnp.asarray(
        rng.integers(0, args.rows, args.m), jnp.int32)
    # contiguous stream: same descriptor count, perfectly local sources —
    # separates issue-rate limits from HBM-access-pattern limits
    idx_contig = jnp.asarray(
        np.arange(args.m, dtype=np.int64) % args.rows, jnp.int32)

    def run(name, fn, *a):
        out = fn(*a)
        _sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        rate = args.m / best / 1e6
        print(f"{name:28s} {best * 1e3:8.2f} ms  {rate:8.1f} M rows/s "
              f"(load {os.getloadavg()[0]:.2f})", flush=True)
        return rate

    # XLA baseline: the packed-patch formulation (batch dim 1 like warp.py)
    tab_b = table[None]

    @jax.jit
    def xla_gather(t, i):
        return jnp.take_along_axis(t, i[None, :, None], axis=1)

    base = run("xla take_along_axis", xla_gather, tab_b, idx_scattered)
    run("xla take_along_axis contig", xla_gather, tab_b, idx_contig)

    dma = jax.jit(functools.partial(
        dma_gather, depth=args.depth, block=args.block))
    try:
        rate = run(f"pallas dma depth={args.depth}", dma, table,
                   idx_scattered)
        run(f"pallas dma contig", dma, table, idx_contig)
        for depth in (4, 16, 32):
            d = jax.jit(functools.partial(
                dma_gather, depth=depth, block=args.block))
            run(f"pallas dma depth={depth}", d, table, idx_scattered)
        print(f"verdict: {'DMA WINS' if rate > base else 'XLA wins'} "
              f"({rate:.1f} vs {base:.1f} M rows/s)", flush=True)
    except Exception as e:
        print(f"pallas dma kernel failed to lower/run: "
              f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
