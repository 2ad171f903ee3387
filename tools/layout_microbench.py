"""Microbenchmark: trailing-dim layout of the AEV accumulation tensors.

Theory under test: VPU ops vectorize over the last two dims ((8, 128)
registers); a tensor ending in Z=32 or R=16 wastes 4-8x of every lane.
Putting the long neighbor/pair axis last should recover it.

    python tools/layout_microbench.py
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
        return acc + jnp.sum(fn(*[a + i * 1e-7 for a in args]))

    scanned = jax.jit(
        lambda *a: jax.lax.fori_loop(0, reps, lambda i, acc: body(i, acc), 0.0)
    )
    _ = float(scanned(*args))
    t0 = time.perf_counter()
    _ = float(scanned(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = 10002
    rng = np.random.RandomState(0)

    # ---- radial-like: exp terms + 2 species masked sums ----
    k, r = 136, 16
    dist = jnp.asarray(rng.uniform(0.5, 5.0, (n, k)).astype(np.float32))
    oh2 = jnp.asarray((rng.rand(n, k, 2) > 0.5).astype(np.float32))
    shifts = jnp.asarray(np.linspace(0.8, 5.1, r).astype(np.float32))

    def radial_nat(d, oh):
        t = 0.25 * jnp.exp(-19.7 * (d[..., None] - shifts) ** 2)  # (N,K,R)
        return jnp.stack(
            [jnp.sum(t * oh[:, :, None, s], axis=1) for s in range(2)], 1
        )

    def radial_tr(d, oh):
        t = 0.25 * jnp.exp(
            -19.7 * (d[:, None, :] - shifts[:, None]) ** 2
        )  # (N,R,K)
        return jnp.stack(
            [jnp.sum(t * oh[:, None, :, s], axis=2) for s in range(2)], 1
        )

    print(f"radial natural (N,K,R)   {timeit(radial_nat, dist, oh2):7.2f} ms")
    print(f"radial transposed (N,R,K){timeit(radial_tr, dist, oh2):7.2f} ms")

    # ---- angular-like: grid vs packed-transposed ----
    ka, z = 28, 32
    blk = 256
    nblk = n // blk  # ignore remainder; relative timing only
    d = jnp.asarray(rng.uniform(0.5, 3.4, (n, ka)).astype(np.float32))
    ohs = jnp.asarray((rng.rand(n, ka, 2) > 0.5).astype(np.float32))
    sh8 = jnp.asarray(np.linspace(0.8, 3.5, 8).astype(np.float32))
    se4 = jnp.asarray(np.linspace(0.2, 3.3, 4).astype(np.float32))

    def ang_grid_block(dd, oh):
        mean = 0.5 * (dd[:, :, None] + dd[:, None, :])  # (B,Ka,Ka)
        cosv = jnp.cos(mean)
        rad = jnp.exp(-12.5 * (mean[..., None] - sh8) ** 2)  # (B,Ka,Ka,8)
        ang = (0.5 + 0.5 * (cosv[..., None] * jnp.cos(se4))) ** 14.1  # (B,..,4)
        t = (rad[..., :, None] * ang[..., None, :]).reshape(
            mean.shape + (z,)
        )
        outs = []
        for s1 in range(2):
            w = jnp.sum(t * oh[:, None, :, None, s1], axis=2)  # (B,Ka,Z)
            for s2 in range(2):
                outs.append(jnp.sum(w * oh[:, :, None, s2], axis=1))
        return jnp.stack(outs, 1)

    kp = ka * (ka - 1) // 2  # 378
    kp_pad = 384
    pj, pk = np.triu_indices(ka, 1)
    gj = np.zeros((ka, kp_pad), np.float32)
    gk = np.zeros((ka, kp_pad), np.float32)
    gj[pj, np.arange(kp)] = 1
    gk[pk, np.arange(kp)] = 1
    gj = jnp.asarray(gj)
    gk = jnp.asarray(gk)

    def ang_packed_tr_block(dd, oh):
        feats = jnp.concatenate([dd[:, None, :], oh.transpose(0, 2, 1)], 1)
        b = feats.shape[0]
        sj = jnp.dot(
            feats.reshape(b * 3, ka), gj, precision=jax.lax.Precision.HIGHEST
        ).reshape(b, 3, kp_pad)
        sk = jnp.dot(
            feats.reshape(b * 3, ka), gk, precision=jax.lax.Precision.HIGHEST
        ).reshape(b, 3, kp_pad)
        mean = 0.5 * (sj[:, 0] + sk[:, 0])  # (B,Kp)
        cosv = jnp.cos(mean)
        rad = jnp.exp(
            -12.5 * (mean[:, None, :] - sh8[:, None]) ** 2
        )  # (B,8,Kp)
        ang = (0.5 + 0.5 * (cosv[:, None, :] * jnp.cos(se4)[:, None])) ** 14.1
        t = (rad[:, :, None, :] * ang[:, None, :, :]).reshape(b, z, kp_pad)
        outs = []
        for s1 in range(2):
            for s2 in range(2):
                w = sj[:, 1 + s1] * sk[:, 1 + s2]  # (B,Kp)
                outs.append(jnp.sum(t * w[:, None, :], axis=2))
        return jnp.stack(outs, 1)

    def blocked(fn):
        def run(dd, oh):
            return jax.lax.map(
                jax.checkpoint(lambda a: fn(*a)),
                (
                    dd[: nblk * blk].reshape(nblk, blk, ka),
                    oh[: nblk * blk].reshape(nblk, blk, ka, 2),
                ),
            )

        return run

    print(f"angular grid (B,Ka,Ka,Z) {timeit(blocked(ang_grid_block), d, ohs):7.2f} ms")
    print(f"angular packed (B,Z,Kp)  {timeit(blocked(ang_packed_tr_block), d, ohs):7.2f} ms")

    g1 = jax.grad(lambda dd: jnp.sum(blocked(ang_grid_block)(dd, ohs) ** 2))
    g2 = jax.grad(lambda dd: jnp.sum(blocked(ang_packed_tr_block)(dd, ohs) ** 2))
    print(f"angular grid grad        {timeit(g1, d):7.2f} ms")
    print(f"angular packed grad      {timeit(g2, d):7.2f} ms")


if __name__ == "__main__":
    main()
