"""Extending the AEV: custom radial/angular terms and cutoff functions.

Analog of ``/root/reference/examples/extending_aev.py``. Terms are flax
pytrees — subclass ``BaseRadial``/``BaseAngular``, store your parameters as
fields, and implement ``compute`` over padded pair lanes. Masking, cutoffs and
species accumulation are handled by the ``AEVComputer``.

    python examples/extending_aev.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    from torchani_tpu.aev import AEVComputer
    from torchani_tpu.aev.terms import BaseRadial
    from torchani_tpu.annotations import Array
    from torchani_tpu.cutoffs import CutoffCosine, parse_cutoff_fn

    # A custom radial term: a Bessel-style basis sin(n*pi*r/rc)/r, as used by
    # some message-passing potentials, instead of ANI's Gaussian comb.
    class BesselRadial(BaseRadial):
        def compute(self, dists: Array) -> Array:
            # dists: (..., pairs). Returns (..., pairs, num_feats). Padded
            # lanes carry garbage distances; the computer masks them out.
            n = jnp.arange(1, self.num_feats + 1, dtype=dists.dtype)
            r = jnp.maximum(dists[..., None], 1e-3)
            return jnp.sin(n * jnp.pi * r / self.cutoff) / r

    radial = BesselRadial(
        cutoff=5.2, cutoff_fn=parse_cutoff_fn("smooth"), num_feats=16
    )

    # Combine with the standard ANI angular term and a cosine cutoff.
    aevc = AEVComputer.like_2x().replace(radial=radial)
    assert isinstance(aevc.radial.cutoff_fn(jnp.asarray(1.0), 5.2), jnp.ndarray)

    species = jnp.asarray([[6, 1, 1, 1, 1]])
    coords = jnp.asarray(
        [[[0.03192167, 0.00638559, 0.01301679],
          [-0.83140486, 0.39370209, -0.26395324],
          [-0.66518241, -0.84461308, 0.20759389],
          [0.45554739, 0.54289633, 0.81170881],
          [0.66091919, -0.16799635, -0.91037834]]]
    )
    elem_idxs = jnp.asarray([[1, 0, 0, 0, 0]])  # (H, C, N, O) order

    aev = aevc(elem_idxs, coords)
    print("custom AEV shape:", aev.shape, "(radial", aevc.radial_len,
          "+ angular", aevc.angular_len, ")")

    # Custom cutoff: swap CutoffCosine for CutoffSmooth (or your own subclass
    # of torchani_tpu.cutoffs.Cutoff with a __call__(dists, cutoff) method).
    smooth = aevc.replace(radial=radial.replace(cutoff_fn=CutoffCosine()))
    print("with cosine cutoff:", float(jnp.abs(smooth(elem_idxs, coords)).sum()))


if __name__ == "__main__":
    main()
