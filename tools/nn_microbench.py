"""NN ensemble matmul-structure microbench (task: lift 47% MXU util).

The MD NN stage measures 3.5 ms fwd+bwd against a 1.65 ms 3-pass-bf16
MAC bound (docs/performance.md roofline).  Hypotheses tested here, at the
exact MD shapes (water box: H block 6668 rows, O block 3334, ANI-2x dims,
E=8 members, precision "high", backward wrt the AEV input):

  A. current: vmap over members of per-species sliced dot chains
     (the layer-1 LHS is member-independent, so vmap broadcasts the
     (rows, 1008) AEV to (E, rows, 1008) — 8x the biggest HBM read)
  B. member-in-output layer 1: (rows, 1008) @ (1008, E*h1) then
     reshape/transpose to (E, rows, h1); later layers stay batched dots
  C. B without the explicit transpose: later layers via
     einsum("nef,efo->neo") (member axis stays in the middle)
  D. all-members-flat: every layer as a single 2D matmul with
     block-diagonal weights (E*h_in, E*h_out) — trades 8x MACs on later
     layers for zero batching; layer-1 cost identical to B

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/nn_microbench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

E = 8
FEAT = 1008
BLOCKS = (  # (rows, hidden dims) per species, water-box ANI-2x
    (6668, (256, 192, 160)),
    (3334, (192, 160, 128)),
)
PREC = jax.lax.Precision.HIGH


def timeit(fn, x, reps=50):
    def body(i, acc):
        return acc + jnp.sum(fn(x + i * 1e-7))

    scanned = jax.jit(lambda x0: jax.lax.fori_loop(0, reps, body, 0.0))
    _ = float(scanned(x))
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def act(x):
    return jax.nn.celu(x, alpha=0.1)


def make_weights(rng, dims):
    """Per-layer (E, in, out) stacks for one species."""
    full = (FEAT,) + tuple(dims) + (1,)
    ws, bs = [], []
    for i in range(len(full) - 1):
        ws.append(
            jnp.asarray(
                rng.standard_normal((E, full[i], full[i + 1])).astype(np.float32)
                / np.sqrt(full[i])
            )
        )
        bs.append(
            jnp.asarray(rng.standard_normal((E, full[i + 1])).astype(np.float32) * 0.01)
        )
    return ws, bs


def main():
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.standard_normal((rows, FEAT)).astype(np.float32))
        for rows, _ in BLOCKS
    ]
    x_all = jnp.concatenate(xs, axis=0)
    weights = [make_weights(rng, dims) for _, dims in BLOCKS]
    offs = np.cumsum([0] + [r for r, _ in BLOCKS])

    def species_x(x):
        return [
            jax.lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]))
            for i in range(len(BLOCKS))
        ]

    # --- A: current formulation (vmap over members of dot chains) ---
    def variant_a(x):
        tot = 0.0
        for (rows, dims), xi, (ws, bs) in zip(BLOCKS, species_x(x), weights):
            def one(w, b):
                h = xi
                for li in range(len(w)):
                    h = jnp.dot(h, w[li], precision=PREC) + b[li]
                    if li + 1 < len(w):
                        h = act(h)
                return h  # (rows, 1)

            vals = jax.vmap(one)(ws, bs)  # (E, rows, 1)
            tot = tot + jnp.sum(jnp.mean(vals, axis=0))
        return tot

    # --- B: member-in-output layer 1, transpose, batched later layers ---
    def variant_b(x):
        tot = 0.0
        for (rows, dims), xi, (ws, bs) in zip(BLOCKS, species_x(x), weights):
            h1 = dims[0]
            w1 = jnp.transpose(ws[0], (1, 0, 2)).reshape(FEAT, E * h1)
            h = jnp.dot(xi, w1, precision=PREC)  # (rows, E*h1)
            h = h.reshape(rows, E, h1) + bs[0][None]
            h = jnp.transpose(h, (1, 0, 2))  # (E, rows, h1)
            for li in range(1, len(ws)):
                h = act(h)
                h = (
                    jax.lax.dot_general(
                        h, ws[li], (((2,), (1,)), ((0,), (0,))), precision=PREC
                    )
                    + bs[li][:, None, :]
                )
            tot = tot + jnp.sum(jnp.mean(h, axis=0))
        return tot

    # --- C: like B but member axis stays in the middle (no transpose) ---
    def variant_c(x):
        tot = 0.0
        for (rows, dims), xi, (ws, bs) in zip(BLOCKS, species_x(x), weights):
            h1 = dims[0]
            w1 = jnp.transpose(ws[0], (1, 0, 2)).reshape(FEAT, E * h1)
            h = jnp.dot(xi, w1, precision=PREC).reshape(rows, E, h1)
            h = h + bs[0][None]
            for li in range(1, len(ws)):
                h = act(h)
                h = (
                    jnp.einsum("nef,efo->neo", h, ws[li], precision=PREC)
                    + bs[li][None]
                )
            tot = tot + jnp.sum(jnp.mean(h, axis=1))
        return tot

    # --- D: block-diagonal later layers (single 2D matmuls throughout) ---
    blockdiag = []
    for (rows, dims), (ws, bs) in zip(BLOCKS, weights):
        wds, bds = [], []
        for li in range(1, len(ws)):
            fin, fout = ws[li].shape[1], ws[li].shape[2]
            wd = np.zeros((E * fin, E * fout), np.float32)
            for e in range(E):
                wd[e * fin : (e + 1) * fin, e * fout : (e + 1) * fout] = np.asarray(
                    ws[li][e]
                )
            wds.append(jnp.asarray(wd))
            bds.append(jnp.asarray(np.asarray(bs[li]).reshape(-1)))
        blockdiag.append((wds, bds))

    def variant_d(x):
        tot = 0.0
        for (rows, dims), xi, (ws, bs), (wds, bds) in zip(
            BLOCKS, species_x(x), weights, blockdiag
        ):
            h1 = dims[0]
            w1 = jnp.transpose(ws[0], (1, 0, 2)).reshape(FEAT, E * h1)
            h = jnp.dot(xi, w1, precision=PREC)
            h = h + bs[0].reshape(-1)[None]
            for wd, bd in zip(wds, bds):
                h = act(h)
                h = jnp.dot(h, wd, precision=PREC) + bd[None]
            tot = tot + jnp.sum(h) / E
        return tot

    variants = dict(a=variant_a, b=variant_b, c=variant_c, d=variant_d)
    ref = float(jax.jit(variant_a)(x_all))
    for name, fn in variants.items():
        val = float(jax.jit(fn)(x_all))
        rel = abs(val - ref) / max(abs(ref), 1e-30)
        f = timeit(fn, x_all)
        fb = timeit(jax.grad(fn), x_all)
        print(
            f"{name}: fwd {f:6.2f} ms   fwd+bwd {fb:6.2f} ms   "
            f"(value rel diff vs a: {rel:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
