"""Kernel-variant A/B for the bucket-dot refresh (VERDICT r2 #4).

Hypothesis from cycle accounting: at water-box shapes the fwd kernel is
VPU-bound (selector build + split-plane sum + masked section sums ~1 us/body
vs 0.67 us MXU at the 50%-utilized C=64 contraction), and the bwd kernel's
9-slab concatenated h-build costs relayout copies.

Variants:
  fwd_v2: stack the bf16 split planes along the CONTRACTION axis
          (LHS (96, 3C), selector tiled to (3C, RC)) — no post-dot split
          sum, contraction 192 instead of 64 (75% MXU util).
  bwd_v2: h via one broadcast-multiply (9,1,RC)x(1,32,RC) + reshape,
          no 9-way concat.

    python tools/bucketdot_v2_experiment.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from torchani_tpu.bucket_refresh import (
    _bucket_select_bwd,
    _bucket_select_fwd,
    _pick_nb,
    _pick_rc,
    _split3,
)

G, C, K = 343, 64, 120
R = C * K
_DN = (((1,), (0,)), ((), ()))


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


# --------------------------------------------------------------------------
# fwd v2: split planes stacked along contraction
# --------------------------------------------------------------------------


def _fwd_kernel_v2(c, nb, keys_ref, v_ref, out_ref):
    def body(b, carry):
        kk = keys_ref[b, 0]
        rc = kk.shape[0]
        rank = kk & 255
        sec = kk >> 8
        # selector (3C, RC): the same rank one-hot tiled 3x down the
        # contraction axis (iota mod C)
        ranks = jax.lax.broadcasted_iota(jnp.int32, (3 * c, rc), 0) % c
        sel = (ranks == rank[None, :]).astype(jnp.bfloat16)
        # one dot, contraction 3C: rows d*32 + s, f32 accumulation sums the
        # three split planes exactly
        t = jax.lax.dot_general(
            v_ref[b], sel, _DN, preferred_element_type=jnp.float32
        )  # (96, RC)
        secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
        m32 = (secs == sec[None, :]).astype(jnp.float32)
        res = jnp.concatenate(
            [
                jnp.sum(t[32 * d : 32 * d + 32] * m32, axis=0, keepdims=True)
                for d in range(3)
            ]
            + [jnp.zeros((5, rc), jnp.float32)],
            axis=0,
        )
        out_ref[b] = res
        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _bucket_select_fwd_v2(cand16, keys):
    hi, mid, lo = cand16
    g, _, c = hi.shape
    r = keys.shape[1]
    rc = _pick_rc(r, 4 * 96 + 2 * 3 * c + 96)
    nb = _pick_nb(g, rc * (4 + 32 * 4) + 96 * 3 * c * 2, 96 * rc * 4)
    # v (G, 96, 3C): split planes side by side along columns
    v = jnp.concatenate([hi, mid, lo], axis=2)
    return pl.pallas_call(
        partial(_fwd_kernel_v2, c, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 96, 3 * c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, 8, rc), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((g, 8, r), jnp.float32),
    )(keys.reshape(g, 1, r), v)


# --------------------------------------------------------------------------
# bwd v2: broadcast h-build
# --------------------------------------------------------------------------


def _bwd_kernel_v2(c, nb, g16_ref, keys_ref, out_ref):
    r = pl.program_id(1)

    def body(b, carry):
        kk = keys_ref[b, 0]
        rc = kk.shape[0]
        rank = kk & 255
        sec = kk >> 8
        ranks = jax.lax.broadcasted_iota(jnp.int32, (rc, c), 1)
        sel_r = (ranks == rank[:, None]).astype(jnp.bfloat16)
        secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
        m32 = (secs == sec[None, :]).astype(jnp.bfloat16)
        g9 = g16_ref[b][:9]  # (9, RC) rows (p, d)
        h = (g9[:, None, :] * m32[None, :, :]).reshape(9 * 32, rc)
        tmp = jax.lax.dot_general(
            h, sel_r, _DN, preferred_element_type=jnp.float32
        )  # (288, C)
        part = tmp[0:96] + tmp[96:192] + tmp[192:288]

        @pl.when(r == 0)
        def _():
            out_ref[b] = part

        @pl.when(r != 0)
        def _():
            out_ref[b] += part

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _bucket_select_bwd_v2(g16, keys, c):
    g, _, r = g16.shape
    rc = _pick_rc(r, 2 * 288 + 2 * c + 96)
    nb = _pick_nb(g, rc * (4 + 16 * 2) + 96 * c * 4, 288 * rc * 2 + 288 * c * 4)
    return pl.pallas_call(
        partial(_bwd_kernel_v2, c, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((nb, 16, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((nb, 96, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 96, c), jnp.float32),
    )(g16, keys.reshape(g, 1, r))


def main():
    rng = np.random.RandomState(0)
    cand_np = rng.randn(G, 3, 32, C).astype(np.float32) * 20.0
    cand_np[:, :, 27:] = 0.0
    cand = jnp.asarray(cand_np.reshape(G, 96, C))
    o = rng.randint(0, 27, (G, R))
    rank = rng.randint(0, C, (G, R))
    keys_np = np.where(rng.rand(G, R) < 0.75, (o << 8) | rank, 27 << 8)
    keys = jnp.asarray(keys_np.astype(np.int32))

    def fwd_v1(c, k):
        return _bucket_select_fwd(_split3(c), k)

    def fwd_v2(c, k):
        return _bucket_select_fwd_v2(_split3(c), k)

    o1 = jax.jit(fwd_v1)(cand, keys)
    o2 = jax.jit(fwd_v2)(cand, keys)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"fwd v2 vs v1 max|diff| = {err:.3g}", flush=True)
    print(f"fwd v1 {timeit(fwd_v1, cand, keys):7.2f} ms", flush=True)
    print(f"fwd v2 {timeit(fwd_v2, cand, keys):7.2f} ms", flush=True)

    gt = jnp.asarray(rng.randn(G, 3, R).astype(np.float32))

    def g16_of(g3):
        hi, mid, lo = _split3(g3)
        return jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )

    def bwd_v1(g3, k):
        return _bucket_select_bwd(g16_of(g3), k, C)

    def bwd_v2(g3, k):
        return _bucket_select_bwd_v2(g16_of(g3), k, C)

    d1 = jax.jit(bwd_v1)(gt, keys)
    d2 = jax.jit(bwd_v2)(gt, keys)
    derr = float(jnp.max(jnp.abs(d1 - d2)))
    print(f"bwd v2 vs v1 max|diff| = {derr:.3g}", flush=True)
    print(f"bwd v1 {timeit(bwd_v1, gt, keys):7.2f} ms", flush=True)
    print(f"bwd v2 {timeit(bwd_v2, gt, keys):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
