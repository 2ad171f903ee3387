"""Calibrate achievable MXU rates at the NN's shapes and precisions.

Questions: (1) what fraction of the 197 TFLOP/s bf16 peak does a clean
large matmul reach at each precision (DEFAULT=1 pass, HIGH=3, HIGHEST=6)?
(2) do the NN's actual layer shapes (out dims 256/192/160/128/1, batched
over 8 members) lose much vs the clean shape?  This pins whether the NN
stage's 47-55%-of-3-pass-peak is a real inefficiency or the practical
ceiling of f32-emulated matmuls on v5e.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/matmul_calibrate.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 FLOP/s


def timeit(fn, x, reps=30):
    def body(i, acc):
        # perturb in the operand's own dtype (an f32 scalar would silently
        # promote a bf16 operand and change what's being measured)
        xx = x + (i.astype(x.dtype) * jnp.asarray(1e-7, x.dtype))
        return acc + jnp.sum(fn(xx)).astype(jnp.float32)

    scanned = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, acc: body(jnp.asarray(i), acc), 0.0
        )
    )
    for attempt in range(3):
        try:
            _ = float(scanned(x))
            break
        except Exception as e:  # transient tunnel hiccups
            if attempt == 2:
                raise
            print(f"  (retry after: {type(e).__name__})", flush=True)
            time.sleep(5)
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("clean 8192x1024x2048", (8192, 1024), (1024, 2048), None),
        ("L1 6668x1008xE*256", (6668, 1008), (1008, 2048), None),
        ("L2 batched E=8 6668x256x192", (8, 6668, 256), (8, 256, 192), 8),
        ("L3 batched E=8 6668x192x160", (8, 6668, 192), (8, 192, 160), 8),
        ("L4 batched E=8 6668x160x1", (8, 6668, 160), (8, 160, 1), 8),
    ]
    passes = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}
    for name, sx, sw, batch in cases:
        x = jnp.asarray(rng.standard_normal(sx).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(sw).astype(np.float32))
        if batch is None:
            macs = sx[0] * sx[1] * sw[1]
            mk = lambda p: (lambda xx: jnp.dot(xx, w, precision=p))  # noqa: E731
        else:
            macs = sx[0] * sx[1] * sx[2] * sw[2]
            mk = lambda p: (  # noqa: E731
                lambda xx: jax.lax.dot_general(
                    xx, w, (((2,), (1,)), ((0,), (0,))), precision=p
                )
            )
        # bf16 single-pass reference (cast inputs)
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        if batch is None:
            fb = lambda xx: jnp.dot(  # noqa: E731
                xx, wb, preferred_element_type=jnp.float32
            )
        else:
            fb = lambda xx: jax.lax.dot_general(  # noqa: E731
                xx, wb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        t = timeit(fb, xb)
        print(
            f"{name:34s} bf16x1    {t:7.3f} ms  "
            f"{2 * macs / (t * 1e-3) / PEAK * 100:5.1f}% of peak",
            flush=True,
        )
        for pname, np_ in passes.items():
            p = getattr(jax.lax.Precision, pname)
            t = timeit(mk(p), x)
            eff = 2 * macs * np_ / (t * 1e-3) / PEAK * 100
            print(
                f"{name:34s} {pname:8s}  {t:7.3f} ms  "
                f"{eff:5.1f}% of {np_}-pass peak",
                flush=True,
            )


if __name__ == "__main__":
    main()
