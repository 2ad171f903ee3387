"""Microbenchmark variants of the per-step Verlet refresh coords gather.

The refresh gathers each atom's K neighbor positions: ``coords[idx]`` with
``idx (A, K)`` over ``coords (A, 3)`` — tiny 12-byte rows, which TPU gathers
handle poorly.  Tests layout variants to find the fastest formulation.

    python tools/refresh_microbench.py
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
    rng = np.random.RandomState(0)
    a, k = 10002, 136
    coords = jnp.asarray(rng.randn(a, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, a, (a, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(a, k) < 0.8)
    shift = jnp.asarray(rng.randn(a, k, 3).astype(np.float32))

    def dist_of(nbr_pos, c):
        diff = nbr_pos - c[:, None, :] + shift
        diff = jnp.where(mask[..., None], diff, 0.0)
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.sqrt(jnp.where(mask, d2, 1.0))

    # v0: current — row gather of (A, 3)
    def v0(c):
        return dist_of(jnp.take(c, jnp.where(mask, idx, 0), axis=0), c)

    # v1: gather from coords padded to (A, 8) rows
    def v1(c):
        c8 = jnp.pad(c, ((0, 0), (0, 5)))
        g = jnp.take(c8, jnp.where(mask, idx, 0), axis=0)[..., :3]
        return dist_of(g, c)

    # v2: three 1-D gathers (per component)
    def v2(c):
        iw = jnp.where(mask, idx, 0)
        g = jnp.stack(
            [jnp.take(c[:, d], iw, axis=0) for d in range(3)], axis=-1
        )
        return dist_of(g, c)

    # v3: flat 1-D gather of a (A*8,) padded buffer with computed offsets
    def v3(c):
        c8 = jnp.pad(c, ((0, 0), (0, 1))).reshape(-1)  # (A*4,)
        iw = jnp.where(mask, idx, 0) * 4
        g = jnp.stack(
            [jnp.take(c8, iw + d, axis=0) for d in range(3)], axis=-1
        )
        return dist_of(g, c)

    for name, fn in [("v0 row(A,3)", v0), ("v1 row(A,8)", v1),
                     ("v2 3x1d", v2), ("v3 flat4", v3)]:
        print(f"{name:14s} {timeit(fn, coords):7.2f} ms", flush=True)

    # v0 including gradient (what the force path pays)
    g0 = jax.jit(jax.grad(lambda c: jnp.sum(v0(c) ** 2)))
    print(f"v0 fwd+bwd     {timeit(g0, coords):7.2f} ms", flush=True)

    # ---- partner-lane backward gather variants ----
    # The backward pulls (A*K) rows from the (A*K, 3) cotangent table —
    # profiled at ~4x the per-row cost of the forward's (A, 3)-source
    # gather.  Hypothesis: source size (16 MB vs 120 KB) dominates gather
    # throughput.  v5 exploits partner locality (partners of rows in an
    # atom block live within +-W rows for spatially-ordered atoms): gather
    # from a dynamic-sliced window instead of the whole table.
    w_atoms = 768
    rev_np = (
        (np.arange(a)[:, None] + rng.randint(-w_atoms, w_atoms, (a, k))) % a
    ) * k + rng.randint(0, k, (a, k))
    rev = jnp.asarray(rev_np.astype(np.int32))
    g = jnp.asarray(rng.randn(a * k, 3).astype(np.float32))

    def v4(g):
        partner = jnp.take(g, jnp.where(mask, rev, 0), axis=0)
        return jnp.sum(jnp.where(mask[..., None], partner, 0.0), axis=1)

    blk = 512
    a_pad = -(-a // blk) * blk
    nblk = a_pad // blk

    def v5(g):
        ext = jnp.concatenate([g[(a - w_atoms) * k:], g, g[: w_atoms * k]])
        win = (blk + 2 * w_atoms) * k
        pad2 = lambda x, f: jnp.pad(  # noqa: E731
            x, ((0, a_pad - a), (0, 0)), constant_values=f
        )
        rev_p = pad2(rev, 0)
        mask_p = pad2(mask, False)

        def one(carry, args):
            b, rev_b, mask_b = args
            # last (padded) block's window would run past ext; clamp the
            # base row (the local index is computed against the same base)
            base = jnp.minimum(b * blk, a - blk)
            window = jax.lax.dynamic_slice(ext, (base * k, 0), (win, 3))
            local = (rev_b - (base - w_atoms) * k) % (a * k)
            part = jnp.take(window, jnp.where(mask_b, local, 0), axis=0)
            out = jnp.sum(jnp.where(mask_b[..., None], part, 0.0), axis=1)
            return carry, out

        _, outs = jax.lax.scan(
            one,
            0,
            (
                jnp.arange(nblk, dtype=jnp.int32),
                rev_p.reshape(nblk, blk, k),
                mask_p.reshape(nblk, blk, k),
            ),
        )
        return outs.reshape(a_pad, 3)[:a]

    print(f"v4 partner16MB {timeit(v4, g):7.2f} ms", flush=True)
    print(f"v5 windowed    {timeit(v5, g):7.2f} ms", flush=True)
    print("v4 vs v5 max diff:",
          float(jnp.max(jnp.abs(v4(g) - v5(g)))), flush=True)

    # ---- decomposed partner backward (radial lanes carry a SCALAR) ----
    # Beyond the angular prefix, the cotangent row is parallel to the unit
    # diff vector (radial terms + pair potentials depend on |diff| only), so
    # the partner pull needs only the scalar dE/d(dist) — payload 1 instead
    # of 3.  Angular-active lanes (a per-row prefix, ~56 of K sorted lanes)
    # still need the full vector, but from a 4x smaller source.
    prefix = 64
    gs = jnp.asarray(rng.randn(a, k).astype(np.float32))  # scalar per lane

    # v6: scalar partner gather, all A*K rows, source (A*K,) 5.4 MB
    def v6(gs):
        part = jnp.take(gs.reshape(-1), jnp.where(mask, rev, 0), axis=0)
        return jnp.sum(jnp.where(mask, part, 0.0), axis=1)

    # v7: vector partner gather restricted to the angular prefix: rows
    # (A, prefix), source g[:, :prefix] (A*prefix, 3)
    rev_pref = jnp.asarray(
        ((np.arange(a)[:, None] + rng.randint(-w_atoms, w_atoms, (a, prefix)))
         % a) * prefix + rng.randint(0, prefix, (a, prefix)).astype(np.int32))
    maskp = mask[:, :prefix]

    def v7(g):
        gp = g.reshape(a, k, 3)[:, :prefix].reshape(a * prefix, 3)
        part = jnp.take(gp, jnp.where(maskp, rev_pref, 0), axis=0)
        return jnp.sum(jnp.where(maskp[..., None], part, 0.0), axis=1)

    # v8: scalar partner gather in ONE fused op with the unit reconstruction
    unit = jnp.asarray(rng.randn(a, k, 3).astype(np.float32))

    def v8(gs):
        part = jnp.take(gs.reshape(-1), jnp.where(mask, rev, 0), axis=0)
        vec = jnp.where(mask, part, 0.0)[..., None] * unit
        return jnp.sum(vec, axis=1)

    print(f"v6 scalar all  {timeit(v6, gs):7.2f} ms", flush=True)
    print(f"v7 vec prefix  {timeit(v7, g):7.2f} ms", flush=True)
    print(f"v8 scalar+unit {timeit(v8, gs):7.2f} ms", flush=True)

    # v9: lane-ALIGNED partner layout premise: if each pair occupied the
    # same lane slot k in both atoms' rows (edge coloring), the partner
    # pull becomes K per-column gathers from (A, 3) sources — the same
    # small-source shape as the fast forward gather.  Timing with fake
    # per-column atom indices (alignment correctness not needed for timing).
    jdx = jnp.asarray(rng.randint(0, a, (a, k)).astype(np.int32))

    def v9(t):
        tt = t.reshape(a, k, 3).transpose(1, 0, 2)  # (K, A, 3)
        part = jax.vmap(lambda src, ii: jnp.take(src, ii, axis=0))(
            tt, jdx.T
        )  # (K, A, 3)
        part = jnp.where(mask.T[..., None], part, 0.0)
        return jnp.sum(part, axis=0)

    # v10: same but scalar payload per column from (A,) sources
    def v10(ts):
        tt = ts.reshape(a, k).T  # (K, A)
        part = jax.vmap(lambda src, ii: jnp.take(src, ii, axis=0))(
            tt, jdx.T
        )
        return jnp.sum(jnp.where(mask.T, part, 0.0), axis=0)

    print(f"v9 aligned col {timeit(v9, g):7.2f} ms", flush=True)
    print(f"v10 aligned sc {timeit(v10, gs):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
