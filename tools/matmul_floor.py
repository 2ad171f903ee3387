"""Separate the timing-harness floor from the matmul cost.

tools/matmul_calibrate.py showed a clean (8192,1024)@(1024,2048) bf16
matmul at only ~18% of nominal peak while 6-pass HIGHEST reached ~52% —
a pattern consistent with a fixed per-iteration cost (the perturb +
full-output jnp.sum the harness adds, or a pipeline ramp) rather than a
low MXU rate.  This measures:

  floor     — the harness body WITHOUT the matmul (perturb + sum only)
  chain     — y = dot(y, W) square-chained (no perturb, no per-iter sum):
              pure dependent matmul throughput
  chain HIGH/HIGHEST — same at emulated-f32 precisions

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/matmul_floor.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def run(scanned, x, reps):
    for attempt in range(3):
        try:
            _ = float(jnp.sum(scanned(x)))
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5)
    t0 = time.perf_counter()
    _ = float(jnp.sum(scanned(x)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    m, k, n = 8192, 1024, 2048
    reps = 50

    # --- floor: perturb + sum, no matmul ---
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    big = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    def floor_body(i, acc):
        return acc + jnp.sum(x + i.astype(x.dtype) * 1e-7) + jnp.sum(big)

    fl = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, a: floor_body(jnp.asarray(i), a), 0.0
        )
    )
    print(f"harness floor (perturb+2 sums)   {run(fl, x, reps):7.3f} ms", flush=True)

    # --- chained square matmuls: pure throughput ---
    macs = m * k * k
    for pname, npass, dtype in [
        ("bf16x1", 1, jnp.bfloat16),
        ("DEFAULT", 1, jnp.float32),
        ("HIGH", 3, jnp.float32),
        ("HIGHEST", 6, jnp.float32),
    ]:
        w = jnp.asarray(
            (rng.standard_normal((k, k)) / np.sqrt(k)).astype(np.float32)
        ).astype(dtype)
        y0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
            dtype
        )
        if dtype == jnp.bfloat16:
            f = lambda y: jnp.dot(y, w, preferred_element_type=jnp.bfloat16)  # noqa: E731
        else:
            p = getattr(jax.lax.Precision, pname)
            f = lambda y: jnp.dot(y, w, precision=p)  # noqa: E731
        chain = jax.jit(
            lambda y0: jax.lax.fori_loop(0, reps, lambda i, y: f(y), y0)
        )
        t = run(chain, y0, reps)
        eff = 2 * macs * npass / (t * 1e-3) / PEAK * 100
        print(
            f"chain {pname:8s} {t:7.3f} ms/matmul   "
            f"{eff:5.1f}% of {npass}-pass nominal peak",
            flush=True,
        )


if __name__ == "__main__":
    main()
