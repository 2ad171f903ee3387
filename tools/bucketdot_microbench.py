"""Microbenchmark: factored bucket-dot refresh vs row gather (TPU).

Times the module's actual kernels (`bucket_refresh._bucket_select_fwd/_bwd`
and the full `bucket_nbr_pos` fwd+vjp) at 10k-atom water-box shapes against
the plain `coords[idx]` row gather they replace.  The factored design
contracts rank on the MXU (dense 81-row LHS) and reduces 27 sections on the
VPU; see bucket_refresh.py for the exactness argument.

    python tools/bucketdot_microbench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.bucket_refresh import (
    _bucket_select_bwd,
    _bucket_select_fwd,
    _split3,
    bucket_nbr_pos,
)

# realistic 10k-atom water-box shapes (measured occupancy max 51 -> C=64)
G, C, K = 343, 64, 120
R = C * K
A = 10002


def timeit(fn, *args, reps=50):
    def body(i, acc):
        return acc + jnp.sum(
            fn(args[0] + i * jnp.asarray(1e-7, args[0].dtype), *args[1:])
        )

    scanned = jax.jit(
        lambda *a: jax.lax.fori_loop(0, reps, lambda i, acc: body(i, acc), 0.0)
    )
    _ = float(scanned(*args))
    t0 = time.perf_counter()
    _ = float(scanned(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.RandomState(0)
    cand_np = rng.randn(G, 3, 32, C).astype(np.float32) * 20.0
    cand_np[:, :, 27:] = 0.0  # pad rows (sentinel target) must be zero
    cand = jnp.asarray(cand_np.reshape(G, 96, C))  # rows d*32 + s
    o = rng.randint(0, 27, (G, R))
    rank = rng.randint(0, C, (G, R))
    keys_np = np.where(rng.rand(G, R) < 0.75, (o << 8) | rank, 27 << 8)
    keys = jnp.asarray(keys_np.astype(np.int32))

    def fwd(c, k):
        return _bucket_select_fwd(_split3(c), k)

    # realistic prefix-dense occupancy for the chunk-skip variant: water-box
    # buckets hold ~29 of 64 slots (occupied slots are each bucket's prefix)
    occ_np = np.clip(rng.poisson(29, (G,)), 0, C).astype(np.int32)
    lane_real = np.arange(R)[None, :] < (occ_np * K)[:, None]
    keys_occ = jnp.asarray(
        np.where(lane_real & (rng.rand(G, R) < 0.9), keys_np, 27 << 8).astype(
            np.int32
        )
    )
    nlanes = jnp.asarray(occ_np * K)

    def fwd_skip(c, k):
        return _bucket_select_fwd(_split3(c), k, nlanes)

    out = jax.jit(fwd)(cand, keys)
    # reference: joint selection per lane (cand rows are d*32 + s)
    ref = np.zeros((G, 3, R), np.float32)
    sec, rk = keys_np >> 8, keys_np & 255
    for g in range(2):
        for r in range(R):
            if sec[g, r] < 27:
                ref[g, :, r] = cand_np[g, :, sec[g, r], rk[g, r]]
    err = float(jnp.max(jnp.abs(out[:2, :3] - ref[:2])))
    print(f"fwd exactness (2 buckets) max|err| = {err:.3g}", flush=True)
    print(f"fwd bucketdot    {timeit(fwd, cand, keys):7.2f} ms", flush=True)
    print(
        f"fwd skip(occ29)  {timeit(fwd_skip, cand, keys_occ):7.2f} ms",
        flush=True,
    )

    gt = jnp.asarray(rng.randn(G, 3, R).astype(np.float32))

    def bwd(g3, k):
        hi, mid, lo = _split3(g3)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        return _bucket_select_bwd(g16, k, C)

    dout = jax.jit(bwd)(gt, keys)  # (G, 96, C) rows d*32 + s
    dsum = np.asarray(dout[:2]).reshape(2, 3, 32, C)[:, :, :27]
    dref = np.zeros((2, 3, 27, C), np.float32)
    gtn = np.asarray(gt)
    for g in range(2):
        for r in range(R):
            if sec[g, r] < 27:
                for d in range(3):
                    dref[g, d, sec[g, r], rk[g, r]] += gtn[g, d, r]
    derr = float(jnp.max(jnp.abs(dsum - dref)))
    print(f"bwd exactness (2 buckets) max|err| = {derr:.3g}", flush=True)
    print(f"bwd bucketdot    {timeit(bwd, gt, keys):7.2f} ms", flush=True)

    def bwd_skip(g3, k):
        hi, mid, lo = _split3(g3)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        return _bucket_select_bwd(g16, k, C, nlanes)

    print(
        f"bwd skip(occ29)  {timeit(bwd_skip, gt, keys_occ):7.2f} ms",
        flush=True,
    )

    # baseline: the row gather at the same total row count, and its vjp
    coords = jnp.asarray(rng.randn(A, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, A, (A, K)).astype(np.int32))

    def v0(c):
        return jnp.take(c, idx, axis=0)

    print(f"v0 row gather    {timeit(v0, coords):7.2f} ms", flush=True)

    gat = jnp.asarray(rng.randn(A, K, 3).astype(np.float32))

    def v0b(g):
        return jax.vjp(v0, coords)[1](g)[0]

    print(f"v0 gather vjp    {timeit(v0b, gat):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
