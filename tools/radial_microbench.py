"""Microbenchmark the radial AEV block exactly as `_aev_flat` runs it.

The cheap-angular ablation (tools/ablate_md.py) shows the radial + one-hot
pipeline costs ~8 ms fwd / ~24 ms fwd+bwd at (10002, 136, 16) — far above
its flop/bandwidth budget.  This bisects the block.

    python tools/radial_microbench.py
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
    from torchani_tpu.aev.terms import ANIRadial

    radial = ANIRadial.like_2x()
    rng = np.random.RandomState(0)
    n, k, s = 10002, 136, 7
    present = (0, 3)
    dist_np = rng.uniform(0.8, 5.0, (n, k)).astype(np.float32)
    mask_np = rng.rand(n, k) < 0.8
    elem_np = np.where(mask_np, rng.choice(np.asarray(present), (n, k)), -1)
    dist = jnp.asarray(np.where(mask_np, dist_np, 1.0))
    rmask = jnp.asarray(mask_np)
    nbr_elem = jnp.asarray(elem_np.astype(np.int32))

    def run(name, fn):
        t_f = timeit(fn, dist)
        g = jax.jit(jax.grad(lambda d: jnp.sum(fn(d) ** 2)))
        t_g = timeit(g, dist)
        print(f"{name:22s} fwd {t_f:7.2f} ms   f+b {t_g:7.2f} ms", flush=True)

    # r0: exact real block (one_hot(S=7), masked sums over present species)
    def r0(d):
        rterms = radial(d) * rmask[..., None]  # (N, K, R)
        onehot = jax.nn.one_hot(
            jnp.where(rmask, nbr_elem, -1), s, dtype=rterms.dtype
        )
        out = jnp.stack(
            [
                jnp.sum(rterms * onehot[:, :, None, t], axis=1)
                if t in present
                else jnp.zeros((n, 16), rterms.dtype)
                for t in range(s)
            ],
            axis=1,
        )
        return out.reshape(n, s * 16)

    # r1: boolean species masks instead of a (N, K, 7) one-hot
    def r1(d):
        rterms = radial(d) * rmask[..., None]
        out = jnp.stack(
            [
                jnp.sum(
                    rterms * ((nbr_elem == t) & rmask)[..., None].astype(
                        rterms.dtype
                    ),
                    axis=1,
                )
                if t in present
                else jnp.zeros((n, 16), rterms.dtype)
                for t in range(s)
            ],
            axis=1,
        )
        return out.reshape(n, s * 16)

    # r2: transposed accumulation (N, R, K): long axis last
    def r2(d):
        eta = radial.eta[0]
        shifts = radial.shifts[:, None]  # (R, 1)
        fc = radial.cutoff_fn(d, radial.cutoff) * rmask
        rterms = 0.25 * jnp.exp(
            -eta * (d[:, None, :] - shifts) ** 2
        ) * fc[:, None, :]  # (N, R, K)
        out = jnp.stack(
            [
                jnp.sum(
                    rterms
                    * ((nbr_elem == t) & rmask).astype(rterms.dtype)[:, None, :],
                    axis=2,
                )
                if t in present
                else jnp.zeros((n, 16), rterms.dtype)
                for t in range(s)
            ],
            axis=1,
        )
        return out.reshape(n, s * 16)

    # r3: terms only, no species sums (isolate the term math)
    def r3(d):
        return jnp.sum(radial(d) * rmask[..., None], axis=1)

    # r4: species sums only, fixed terms (isolate the contraction)
    fixed = jax.jit(lambda d: radial(d) * rmask[..., None])(dist)

    def r4(d):
        rterms = fixed + d[..., None] * 0  # keep d in the graph
        onehot = jax.nn.one_hot(
            jnp.where(rmask, nbr_elem, -1), s, dtype=rterms.dtype
        )
        out = jnp.stack(
            [
                jnp.sum(rterms * onehot[:, :, None, t], axis=1)
                if t in present
                else jnp.zeros((n, 16), rterms.dtype)
                for t in range(s)
            ],
            axis=1,
        )
        return out.reshape(n, s * 16)

    for name, fn in [
        ("r0 exact", r0),
        ("r1 bool-masks", r1),
        ("r2 transposed", r2),
        ("r3 terms-only", r3),
        ("r4 sums-only", r4),
    ]:
        run(name, fn)

    # numerical check r0 vs r2
    a, b = r0(dist), r2(dist)
    print("r0 vs r2 max diff:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
