"""Persistent TPU job runner (development tool).

The tunneled axon TPU plugin takes 1-15 minutes to initialize per python
process (CLAUDE.md), which makes iterate-on-kernel loops impractical as
one-process-per-experiment. This worker initializes the backend ONCE and then
executes job files serially:

    # start (in tmux):     python scripts/tpu_worker.py /tmp/tpujobs
    # submit a job:        cp myexp.py /tmp/tpujobs/010_myexp.py
    # result:              /tmp/tpujobs/010_myexp.py.out  (stdout+traceback)
    # done marker:         /tmp/tpujobs/010_myexp.py.done

Jobs run inside the live process (exec in a fresh module namespace), so jit
caches persist across related jobs. A job that hard-crashes the runtime
kills the worker — just restart it.
"""

import io
import contextlib
import os
import sys
import time
import traceback


def main(jobdir: str) -> None:
    os.makedirs(jobdir, exist_ok=True)
    t0 = time.time()
    import jax

    devs = jax.devices()
    print(f"[worker] jax ready in {time.time() - t0:.1f}s: {devs}", flush=True)

    while True:
        jobs = sorted(
            f for f in os.listdir(jobdir)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(jobdir, f + ".done")
            )
        )
        if not jobs:
            time.sleep(1.0)
            continue
        name = jobs[0]
        path = os.path.join(jobdir, name)
        print(f"[worker] running {name}", flush=True)
        buf = io.StringIO()
        t1 = time.time()
        try:
            with open(path) as fh:
                src = fh.read()
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), {"__name__": "__tpujob__"})
            status = "OK"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "FAIL"
        dt = time.time() - t1
        with open(path + ".out", "w") as fh:
            fh.write(buf.getvalue())
            fh.write(f"\n[worker] {status} in {dt:.1f}s\n")
        with open(path + ".done", "w") as fh:
            fh.write(status)
        print(f"[worker] {name}: {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpujobs")
