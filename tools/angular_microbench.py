"""Microbenchmark the real angular-row implementations on MD shapes.

Times `_angular_rows_grid` vs `_angular_rows_packed` exactly as the MD
force path runs them: ~10k atoms, Ka=28, water species (2 of 7 present),
blocked 256 under lax.map + jax.checkpoint, fwd and grad.

    python tools/angular_microbench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30):
    def body(i, acc):
        return acc + jnp.sum(fn(args[0] + i * 1e-7, *args[1:]))

    scanned = jax.jit(
        lambda *a: jax.lax.fori_loop(0, reps, lambda i, acc: body(i, acc), 0.0)
    )
    _ = float(scanned(*args))
    t0 = time.perf_counter()
    _ = float(scanned(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from torchani_tpu.aev.computer import (
        _angular_rows_grid,
        _angular_rows_packed,
    )
    from torchani_tpu.aev.terms import ANIAngular

    ang = ANIAngular.like_2x()
    rng = np.random.RandomState(0)
    n, ka, s = 10240, 28, 7
    blk = 256
    present = (0, 3)  # water: H, O
    vec = rng.randn(n, ka, 3).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    dist_np = rng.uniform(0.8, 3.4, (n, ka)).astype(np.float32)
    maskf_np = (rng.rand(n, ka) < 0.8).astype(np.float32)
    elem = rng.choice(np.asarray(present), (n, ka))
    oh_np = np.zeros((n, ka, s), np.float32)
    np.put_along_axis(oh_np, elem[..., None], 1.0, axis=2)
    oh_np *= maskf_np[..., None]
    dist = jnp.asarray(np.where(maskf_np > 0.5, dist_np, 1.0))
    diff = jnp.asarray(vec * dist_np[..., None] * maskf_np[..., None])
    maskf = jnp.asarray(maskf_np)
    oh = jnp.asarray(oh_np)

    nblk = n // blk

    def blocked(fn, remat=True):
        def run(d, df, mf, o):
            args = tuple(
                x.reshape((nblk, blk) + x.shape[1:]) for x in (d, df, mf, o)
            )
            body = lambda a: fn(ang, s, *a, present=present)  # noqa: E731
            if remat:
                body = jax.checkpoint(body)
            return jax.lax.map(body, args).reshape(n, -1)

        return run

    for name, fn in [
        ("grid", blocked(_angular_rows_grid)),
        ("packed", blocked(_angular_rows_packed)),
        ("packed-noremat", blocked(_angular_rows_packed, remat=False)),
        ("packed-1shot", lambda d, df, mf, o: _angular_rows_packed(
            ang, s, d, df, mf, o, present=present)),
    ]:
        t_f = timeit(fn, dist, diff, maskf, oh)
        g = jax.jit(
            jax.grad(
                lambda d, df: jnp.sum(fn(d, df, maskf, oh) ** 2),
                argnums=(0, 1),
            )
        )
        t_g = timeit(lambda d: g(d, diff)[0], dist)
        print(f"{name:8s} fwd {t_f:7.2f} ms   fwd+bwd {t_g:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
