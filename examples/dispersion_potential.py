"""Adding two-body D3 dispersion to an ANI model.

Analog of ``/root/reference/examples/dispersion_potential.py``. ANI-style
models trained on DFT without dispersion corrections miss long-range van der
Waals attraction; ``TwoBodyDispersionD3`` adds Grimme's D3(BJ) two-body term
(coordination-number-interpolated C6, Becke–Johnson damping).

    python examples/dispersion_potential.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.potentials import TwoBodyDispersionD3

    symbols = ("H", "C", "N", "O")
    # One-liner: simple_ani(..., dispersion=True). Explicit form:
    plain = tt.simple_ani(symbols, ensemble_size=1, key=jax.random.PRNGKey(0))
    disp = TwoBodyDispersionD3.from_functional(symbols, functional="wb97x")
    model = plain.replace(potentials={**plain.potentials, "dispersion": disp})

    # A methane dimer at increasing separation: dispersion adds the weak
    # long-range attraction the bare NN cannot represent outside its cutoff.
    ch4 = jnp.asarray([[0.0, 0.0, 0.0], [0.63, 0.63, 0.63],
                       [-0.63, -0.63, 0.63], [-0.63, 0.63, -0.63],
                       [0.63, -0.63, -0.63]])
    species = jnp.asarray([[6, 1, 1, 1, 1, 6, 1, 1, 1, 1]])

    def dimer(m, d):
        c = jnp.concatenate([ch4, ch4 + jnp.array([d, 0.0, 0.0])])[None]
        return m(species, c)[0]

    seps = jnp.asarray([3.5, 4.5, 6.0, 8.0, 12.0])
    e_d = jax.jit(lambda m: jax.vmap(lambda d: dimer(m, d))(seps))(model)
    e_p = jax.jit(lambda m: jax.vmap(lambda d: dimer(m, d))(seps))(plain)
    print(" d (A)   dispersion contribution (Ha)")
    for d, ed, ep in zip(seps, e_d, e_p):
        print(f" {float(d):5.1f}   {float(ed - ep):+.6f}")

    # Dispersion is attractive and decays ~ 1/r^6.
    contrib = jnp.asarray(e_d) - jnp.asarray(e_p)
    assert float(contrib[0]) < float(contrib[-1]) < 0
    print("long-range attraction present and decaying — OK")


if __name__ == "__main__":
    main()
