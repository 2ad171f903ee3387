"""Measure speed + accuracy of NN matmul precision levels on TPU.

On TPU f32 matmuls are emulated with bf16 passes: HIGHEST = 6 passes,
HIGH = 3 passes (~f32-equivalent error), DEFAULT = 1 pass (bf16 inputs —
the TF32-like mode the reference explicitly bans).  The ensemble MLP chain
runs at HIGHEST; this measures what HIGH would save and what it costs in
energy/force error on the 10k-atom MD shapes.

    python tools/nn_precision_bench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, x, reps=30):
    def body(i, acc):
        return acc + jnp.sum(fn(x + i * 1e-7))

    scanned = jax.jit(lambda x0: jax.lax.fori_loop(0, reps, body, 0.0))
    _ = float(scanned(x))
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True)
    model = md.model
    state = md.init(jnp.asarray(coords))
    elem = md.elem_idxs
    c0 = state.coords
    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    networks = nnp.neural_networks

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    aevs = jax.jit(
        lambda c: aevc.compute_from_neighbors(
            elem, c[None], batched(refresh_and_narrow(c))
        )
    )(c0)

    def nn_fn(a):
        return jnp.sum(networks(elem, a))

    # the network code pins precision=_HIGHEST explicitly, so patch the
    # module constant (a context manager would not override explicit args)
    import torchani_tpu.nn.containers as NC

    results = {}
    for prec in ("highest", "high", "default"):
        NC._HIGHEST = getattr(jax.lax.Precision, prec.upper())
        t_f = timeit(nn_fn, aevs)
        t_g = timeit(jax.jit(jax.grad(nn_fn)), aevs)
        e = float(jax.jit(nn_fn)(aevs))
        g = jax.jit(jax.grad(nn_fn))(aevs)
        results[prec] = (t_f, t_g, e, g)
        print(f"{prec:8s} fwd {t_f:6.2f} ms  f+b {t_g:6.2f} ms  E={e:.8f}",
              flush=True)

    e0, g0 = results["highest"][2], results["highest"][3]
    for prec in ("high", "default"):
        e, g = results[prec][2], results[prec][3]
        derr = abs(e - e0)
        gerr = float(jnp.max(jnp.abs(g - g0)))
        grel = float(gerr / (jnp.max(jnp.abs(g0)) + 1e-30))
        print(
            f"{prec:8s} |dE|={derr:.3e} Ha ({derr/10002*1e6:.3f} uHa/atom)  "
            f"max|dG|={gerr:.3e} (rel {grel:.3e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
