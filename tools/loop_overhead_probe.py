"""Quantify per-iteration overhead of fori_loop vs scan on the axon TPU.

tools/matmul_floor.py found EVERY loop body — including one with no
matmul at all — costs ~0.52 ms/iteration.  If that is fori_loop (dynamic
while) per-iteration overhead specific to this tunneled device, every
timeit-style stage measurement in tools/ is inflated by ~0.5 ms while the
production MD path (lax.scan inside one jit) is not.  Measures, at
reps=50 and 200:

  empty fori    — body: acc + 1.0
  empty scan    — scan body: carry + 1.0
  chain fori    — y = dot(y, W) bf16 per iteration (8192x1024x1024)
  chain scan    — same body under lax.scan

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/loop_overhead_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(make_prog, x, reps):
    prog = jax.jit(make_prog(reps))
    for attempt in range(3):
        try:
            _ = float(jnp.sum(prog(x)))
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5)
    t0 = time.perf_counter()
    _ = float(jnp.sum(prog(x)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    m, k = 8192, 1024
    w = jnp.asarray(
        (rng.standard_normal((k, k)) / np.sqrt(k)).astype(np.float32)
    ).astype(jnp.bfloat16)
    y0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    mm = lambda y: jnp.dot(y, w, preferred_element_type=jnp.bfloat16)  # noqa: E731

    for reps in (50, 200):
        e_fori = bench(
            lambda r: lambda x: jax.lax.fori_loop(
                0, r, lambda i, a: a + 1.0, jnp.zeros(())
            ),
            y0, reps,
        )
        e_scan = bench(
            lambda r: lambda x: jax.lax.scan(
                lambda c, _: (c + 1.0, None), jnp.zeros(()), None, length=r
            )[0],
            y0, reps,
        )
        c_fori = bench(
            lambda r: lambda x: jax.lax.fori_loop(0, r, lambda i, y: mm(y), x),
            y0, reps,
        )
        c_scan = bench(
            lambda r: lambda x: jax.lax.scan(
                lambda y, _: (mm(y), None), x, None, length=r
            )[0],
            y0, reps,
        )
        print(
            f"reps={reps:4d}  empty fori {e_fori:7.4f}  empty scan {e_scan:7.4f}  "
            f"chain fori {c_fori:7.4f}  chain scan {c_scan:7.4f}  ms/iter",
            flush=True,
        )


if __name__ == "__main__":
    main()
