"""Adding a repulsive potential to fix short-range behavior.

Analog of ``/root/reference/examples/repulsive_potential.py``. Pure NN
potentials are unreliable below the training data's distance range; a
physical xTB/ZBL repulsion term restores the correct short-range wall. Shows
assembling a model with an extra potential and comparing dissociation curves.

    python examples/repulsive_potential.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.potentials import RepulsionXTB

    symbols = ("H", "C", "N", "O")
    plain = tt.simple_ani(symbols, ensemble_size=1, key=jax.random.PRNGKey(0),
                          repulsion=False)
    # simple_ani(..., repulsion=True) is the one-liner; equivalently attach a
    # potential explicitly to an existing model:
    rep = RepulsionXTB.make(symbols, cutoff=5.1)
    repulsive = plain.replace(potentials={**plain.potentials, "repulsion": rep})

    # H2 dissociation scan: energies at shrinking bond lengths.
    dists = jnp.linspace(0.3, 1.5, 13)
    species = jnp.asarray([[1, 1]])

    def energy(m, d):
        c = jnp.stack([jnp.zeros(3), jnp.array([d, 0.0, 0.0])])[None]
        return m(species, c)[0]

    scan = jax.jit(lambda m: jax.vmap(lambda d: energy(m, d))(dists))
    e_plain, e_rep = scan(plain), scan(repulsive)
    print(" d (A)   plain NN    +repulsion")
    for d, ep, er in zip(dists, e_plain, e_rep):
        print(f" {float(d):5.2f}  {float(ep):9.4f}  {float(er):9.4f}")

    # The NN is flat/arbitrary at 0.3 A (random weights, no data there); the
    # physical term adds a wall that grows monotonically as d -> 0.
    wall = jnp.asarray(e_rep) - jnp.asarray(e_plain)
    assert float(wall[0]) > 10 * float(wall[-1]) > 0, "wall should dominate"
    print(f"repulsion contribution: {float(wall[0]):.4f} Ha at 0.3 A vs "
          f"{float(wall[-1]):.4f} Ha at 1.5 A")


if __name__ == "__main__":
    main()
