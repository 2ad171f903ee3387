"""Multi-chip molecular dynamics: atom-sharded force evaluation.

The reference has no distributed runtime at all — its domain-decomposition
story is "let LAMMPS own the decomposition and call
``compute_from_external_neighbors``" (reference ``arch.py:171-206``,
``ase.py:50-53``). On TPU we can own it natively: the dominant AEV + NN work
is embarrassingly parallel over atom ROWS of the full neighbor table, so

* coordinates stay replicated on every chip (10k atoms = 120 KB — trivial
  next to the per-atom compute),
* the cached Verlet neighbor table is row-sharded over the mesh's ``atoms``
  axis with ``shard_map`` (neighbor indices stay GLOBAL: gathers read the
  replicated coords/species),
* each chip computes AEVs + network energies for its shard; one ``psum``
  yields the total energy, and ``jax.grad`` through the ``shard_map``
  produces full forces (the transpose of the replicated-coords gather is the
  gradient all-reduce — XLA inserts it over ICI).

Cheap terms (pair potentials, self energies) and the integrator run
replicated; the cell-list rebuild also runs replicated (it is ~5% of a step
and keeps every chip's topology bit-identical).

Result: single-program SPMD MD whose hot loop scales ~linearly with chips,
validated against the single-device driver in ``tests/test_parallel_md.py``.
"""

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from torchani_tpu.annotations import Array
from torchani_tpu.md import MDState, MolecularDynamics, _refresh_neighbors
from torchani_tpu.neighbors import (
    Neighbors,
    narrow_to_cutoff,
    repack_to_capacity,
)

__all__ = ["ShardedMolecularDynamics"]


def _nnp_shard_energy(model, elem_rows, elem_full_flat, nbrs: Neighbors):
    """NNP energy of one shard of atom rows (global neighbor indices)."""
    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    rn = narrow_to_cutoff(nbrs, aevc.radial.cutoff)
    an = narrow_to_cutoff(nbrs, aevc.angular.cutoff)
    cap = aevc._angular_capacity(nbrs.capacity, elem_rows.shape[0])
    if cap < an.capacity:
        an = repack_to_capacity(an, cap)
    aev = aevc._aev_flat(elem_full_flat, rn, an)  # (A_shard, feats)
    overflow = nbrs.overflow | an.overflow
    aev = aev * jnp.where(overflow, jnp.float32(jnp.nan), jnp.float32(1.0))
    return nnp.neural_networks(elem_rows[None], aev[None])[0]


class ShardedMolecularDynamics(MolecularDynamics):
    """`MolecularDynamics` with the NNP force evaluation sharded over atoms.

    Pass a 1D ``jax.sharding.Mesh`` (axis name ``atoms``); the atom count is
    padded to a multiple of the mesh size with ``-1`` dummy atoms (masked by
    the neighborlist, zero-energy in the networks).
    """

    def __init__(self, model, species: Array, mesh: Mesh, **kwargs) -> None:
        if len(mesh.axis_names) != 1:
            raise ValueError("ShardedMolecularDynamics takes a 1D mesh")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        d = mesh.devices.size
        species = jnp.asarray(species)
        a = species.shape[-1]
        pad = (-a) % d
        if pad:
            species = jnp.concatenate(
                [species, jnp.full((1, pad), -1, species.dtype)], axis=-1
            )
        self._atom_pad = pad
        super().__init__(model, species, **kwargs)

    def init(self, coords: Array, *args, **kwargs) -> MDState:
        coords = jnp.asarray(coords)
        if coords.ndim == 3:
            coords = coords[0]
        if self._atom_pad:
            # dummy atoms parked far outside the cell; the neighborlist masks
            # them by species, forces on them stay zero
            park = jnp.max(jnp.abs(coords)) + 100.0
            extra = jnp.full((self._atom_pad, 3), park, coords.dtype)
            coords = jnp.concatenate([coords, extra], axis=0)
        return super().init(coords, *args, **kwargs)

    def _energy_and_forces(self, state: MDState, coords: Array):
        model = self.model
        elem = self.elem_idxs  # (1, Ap)
        elem_flat = elem.reshape(-1)

        def energy(c):
            nb = narrow_to_cutoff(_refresh_neighbors(state, c), self.cutoff)
            cs = self._to_internal(c)

            # --- replicated cheap terms ---
            e_total = jnp.asarray(0.0, jnp.float32)
            from torchani_tpu.md import _batch1 as batched
            for name, pot in model.potentials.items():
                if name == "nnp" or not pot.enabled:
                    continue
                nbp = nb
                if not math.isinf(pot.cutoff) and pot.cutoff < self.cutoff:
                    nbp = narrow_to_cutoff(nb, pot.cutoff)
                e_total = e_total + jnp.sum(
                    pot.compute_from_neighbors(elem, cs[None], batched(nbp)).energies
                )
            if model.energy_shifter is not None and model.energy_shifter.enabled:
                e_total = e_total + jnp.sum(model.energy_shifter(elem))

            # --- sharded NNP term ---
            def local(idx, mask, diff, dist, elem_rows):
                rows = Neighbors(
                    idx=idx, mask=mask, diff=diff, dist=dist, overflow=nb.overflow
                )
                e = _nnp_shard_energy(model, elem_rows, elem_flat, rows)
                return jax.lax.psum(e, self.axis)

            e_nnp = jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis), P(self.axis), P(self.axis)),
                out_specs=P(),
                check_vma=False,
            )(nb.idx, nb.mask, nb.diff, nb.dist, elem_flat)
            return e_total + e_nnp

        e, g = jax.value_and_grad(energy)(coords)
        return e, -g
