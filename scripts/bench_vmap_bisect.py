"""vmap pathology check: same fpo computation via vmap / scan / folded batch."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics.validation import forward_prop_flow_once

RES = (480, 640)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    fmap = jnp.asarray(rng.normal(size=(1, RES[0], RES[1], 2)), jnp.float32)
    maps10 = jnp.asarray(
        rng.normal(size=(10, 1, RES[0], RES[1], 2)), jnp.float32
    )

    f1 = jax.jit(lambda m: forward_prop_flow_once(m, RES))
    print(f"single fpo: {timeit(f1, fmap)*1e3:.2f} ms")

    fv = jax.jit(
        lambda ms: jax.vmap(lambda m: forward_prop_flow_once(m, RES))(ms)
    )
    print(f"vmap10 fpo: {timeit(fv, maps10)*1e3:.2f} ms")

    print(f"single fpo (again): {timeit(f1, fmap)*1e3:.2f} ms")

    def loop10(ms):
        outs = [forward_prop_flow_once(ms[i], RES) for i in range(10)]
        return jnp.stack(outs)

    print(f"unrolled-10 fpo: {timeit(jax.jit(loop10), maps10)*1e3:.2f} ms")

    def scan10(ms):
        def body(_, m):
            return None, forward_prop_flow_once(m, RES)

        _, outs = jax.lax.scan(body, None, ms)
        return outs

    print(f"scan-10 fpo: {timeit(jax.jit(scan10), maps10)*1e3:.2f} ms")

    def fold10(ms):
        flat = ms.reshape(10, RES[0], RES[1], 2)
        out = forward_prop_flow_once(flat, RES)  # batch = 10 natively
        return out.reshape(10, 1, RES[0], RES[1], 2)

    print(f"folded-batch-10 fpo: {timeit(jax.jit(fold10), maps10)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
