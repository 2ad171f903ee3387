"""Autograd wrappers: forces, Hessians, vibrational analysis, single_point.

Counterpart of ``/root/reference/torchani/grad.py``.  Where the reference
drives ``torch.autograd.grad`` (forces) and a row-by-row loop of grads
(Hessians, ``grad.py:122-141``), here everything is a composition of
``jax.grad`` / ``jax.jacfwd``: the Hessian is one forward-over-reverse pass.
"""

import typing as tp

import jax
import jax.numpy as jnp

from torchani_tpu.annotations import Array
from torchani_tpu.tuples import VibAnalysis
from torchani_tpu.units import sqrt_mhessian2invcm, mhessian2fconst
from torchani_tpu.utils import exact_matmul, get_atomic_masses

__all__ = [
    "energies",
    "forces",
    "grads",
    "calc_forces",
    "calc_grads",
    "calc_hessians",
    "calc_forces_and_hessians",
    "energies_and_forces",
    "forces_and_hessians",
    "energies_forces_and_hessians",
    "forces_for_training",
    "hessians",
    "members_energies_and_forces",
    "force_qbc",
    "stress_scaling",
    "stress_fdotr",
    "vibrational_analysis",
    "single_point",
]


def energies(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
    **kwargs,
) -> Array:
    return model(species, coords, cell, pbc, **kwargs)


def _energy_sum(model, species, coords, cell, pbc, **kwargs):
    return jnp.sum(model(species, coords, cell, pbc, **kwargs))


def forces(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
    **kwargs,
) -> Array:
    """Forces = -dE/dr, shape ``(molecules, atoms, 3)``."""
    g = jax.grad(_energy_sum, argnums=2)(model, species, coords, cell, pbc, **kwargs)
    return -g


def energies_and_forces(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
    **kwargs,
) -> tp.Tuple[Array, Array]:
    def esum(c):
        e = model(species, c, cell, pbc, **kwargs)
        return jnp.sum(e), e

    # one forward serves both outputs (value_and_grad + aux) — relying on
    # XLA CSE to merge a second model call is not guaranteed eagerly
    (_, e_vec), g = jax.value_and_grad(esum, has_aux=True)(coords)
    return e_vec, -g


#: alias — in JAX the same code path supports grad-of-grad (force training)
forces_for_training = forces


def grads(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
    **kwargs,
) -> Array:
    """Raw energy gradients dE/dr (= -forces); reference ``grad.py:68-79``."""
    return jax.grad(_energy_sum, argnums=2)(
        model, species, coords, cell, pbc, **kwargs
    )


def forces_and_hessians(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
) -> "ForcesHessians":
    """Forces and Hessians in one call (reference ``grad.py:86-105``)."""
    from torchani_tpu.tuples import ForcesHessians

    f = forces(model, species, coords, cell, pbc)
    h = hessians(model, species, coords, cell, pbc)
    return ForcesHessians(f, h)


def energies_forces_and_hessians(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
) -> "EnergiesForcesHessians":
    """Energies, forces and Hessians (reference ``grad.py:239-260``)."""
    from torchani_tpu.tuples import EnergiesForcesHessians

    e, f = energies_and_forces(model, species, coords, cell, pbc)
    h = hessians(model, species, coords, cell, pbc)
    return EnergiesForcesHessians(e, f, h)


# Reference-name aliases (reference ``grad.py:77-78, 106``).  The reference
# signatures take a live autograd graph (energies tensor + leaf coords);
# the JAX equivalents are functional — they take (model, species, coords).
calc_forces = forces
calc_grads = grads
calc_forces_and_hessians = forces_and_hessians


def hessians(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
) -> Array:
    """Hessian of each molecule, shape ``(molecules, 3A, 3A)``.

    One ``jacfwd`` of the force function (forward-over-reverse), replacing the
    reference's O(3A) backward-pass loop.
    """
    c, a = species.shape

    def flat_grad(flat_coords: Array) -> Array:
        g = jax.grad(_energy_sum, argnums=2)(
            model, species, flat_coords.reshape(c, a, 3), cell, pbc
        )
        return g.reshape(c, a * 3)

    h = jax.jacfwd(flat_grad)(coords.reshape(c, a * 3))  # (C, 3A, C, 3A)
    # energies of molecule i depend only on coords of i: take the block diagonal
    idx = jnp.arange(c)
    return h[idx, :, idx, :]


calc_hessians = hessians  # reference-name alias (``grad.py:150``)


def vibrational_analysis(
    masses: Array,  # (C, A)
    hessian: Array,  # (C, 3A, 3A)
    mode_type: str = "MDU",
    unit: str = "cm^-1",
) -> VibAnalysis:
    """Normal-mode analysis from mass-weighted Hessian eigendecomposition.

    Mirrors reference ``grad.py:152-260`` (MDU modes: mass-deweighted,
    unnormalized).  Supports a single molecule or a batch.
    """
    if unit not in ("cm^-1", "meV"):
        raise ValueError("Only cm^-1 and meV are supported right now")
    c, a = masses.shape
    inv_sqrt_m = 1.0 / jnp.sqrt(masses)  # (C, A)
    inv_sqrt_m3 = jnp.repeat(inv_sqrt_m, 3, axis=-1)  # (C, 3A)
    mass_scaled = hessian * inv_sqrt_m3[:, :, None] * inv_sqrt_m3[:, None, :]
    eigenvalues, eigenvectors = jnp.linalg.eigh(mass_scaled)
    # angular frequencies -> wavenumbers; negative eigenvalues -> imaginary
    # frequencies reported as negative (reference convention)
    signs = jnp.sign(eigenvalues)
    angular = jnp.sqrt(jnp.abs(eigenvalues)) * signs
    frequencies = angular / (2 * jnp.pi)
    wavenumbers = sqrt_mhessian2invcm(frequencies)

    # modes: columns of eigenvectors, mass-deweighted
    mw_normalized = jnp.swapaxes(eigenvectors, -1, -2)  # (C, 3A, 3A) rows=modes
    md_unnormalized = mw_normalized * inv_sqrt_m3[:, None, :]
    norm = jnp.linalg.norm(md_unnormalized, axis=-1, keepdims=True)
    rmasses = 1.0 / (norm**2)[..., 0]  # (C, 3A)
    fconstants = mhessian2fconst(eigenvalues) * rmasses
    if mode_type == "MDU":
        modes = md_unnormalized
    elif mode_type == "MDN":
        modes = md_unnormalized / norm
    elif mode_type == "MWN":
        modes = mw_normalized
    else:
        raise ValueError(f"Unsupported mode type {mode_type}")
    modes = modes.reshape(c, 3 * a, a, 3)
    return VibAnalysis(wavenumbers, modes, fconstants, rmasses)


def members_energies_and_forces(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
) -> tp.Tuple[Array, Array]:
    """Per-ensemble-member energies (E, C) and forces (E, C, A, 3).

    Reference ``members_forces`` analog: forces of each member are the
    gradients of that member's energy.
    """
    def member_sum(c):
        return jnp.sum(model(species, c, cell, pbc, ensemble_values=True), axis=(1,))

    energies = model(species, coords, cell, pbc, ensemble_values=True)
    jac = jax.jacrev(lambda c: member_sum(c))(coords)  # (E, C, A, 3)
    return energies, -jac


def force_qbc(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
) -> Array:
    """Per-atom force disagreement across ensemble members (E-std of |F|)."""
    _, forces = members_energies_and_forces(model, species, coords, cell, pbc)
    return jnp.std(jnp.linalg.norm(forces, axis=-1), axis=0, ddof=1)


def stress_scaling(
    model,
    species: Array,
    coords: Array,
    cell: Array,
    pbc: Array,
) -> Array:
    """Stress via the cell-scaling (epsilon-strain) trick, shape ``(3, 3)``.

    ``stress = (1/V) dE/d(eps)`` evaluated at zero strain, where coords and
    cell are scaled by ``(I + eps)`` (reference ``ase.py:111-121, 171-173``).

    The neighbor topology is built once at zero strain (it cannot change to
    first order) and the strain is applied to the cached diff vectors — this
    keeps the neighborlist un-traced and is exactly equivalent at eps = 0.
    """
    volume = jnp.abs(jnp.linalg.det(cell))
    elem_idxs = model._convert(species)
    neighbors = model._neighborlist()(model.cutoff, elem_idxs, coords, cell, pbc)

    def energy(eps):
        scaling = jnp.eye(3, dtype=coords.dtype) + eps
        diff = exact_matmul(neighbors.diff, scaling)
        nb = neighbors.replace(
            diff=diff,
            dist=jnp.sqrt(
                jnp.where(neighbors.mask, jnp.sum(diff * diff, axis=-1), 1.0)
            ),
        )
        return jnp.sum(
            model.compute_from_neighbors(
                elem_idxs, exact_matmul(coords, scaling), nb
            ).energies
        )

    return jax.grad(energy)(jnp.zeros((3, 3), dtype=coords.dtype)) / volume


def stress_fdotr(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array],
    pbc: tp.Optional[Array],
) -> Array:
    """Virial stress from dE/d(diff_vectors) x diff_vectors.

    Works without a cell (for externally-managed domain decomposition,
    reference ``ase.py:50-53, 122-131``); with a cell the volume normalizes.
    """
    from torchani_tpu.neighbors import parse_neighborlist

    elem_idxs = model._convert(species)
    nlist = model._neighborlist()
    neighbors = nlist(model.cutoff, elem_idxs, coords, cell, pbc)

    def energy(diff):
        nb = neighbors.replace(
            diff=diff,
            dist=jnp.sqrt(
                jnp.where(
                    neighbors.mask, jnp.sum(diff * diff, axis=-1), 1.0
                )
            ),
        )
        return jnp.sum(
            model.compute_from_neighbors(elem_idxs, coords, nb).energies
        )

    de_ddiff = jax.grad(energy)(neighbors.diff)
    # each lane's partial derivative covers only that lane's contribution, so
    # no double-count correction is needed for the full (two-lane) table
    virial = jnp.einsum(
        "...x,...y->xy",
        de_ddiff,
        neighbors.diff,
        precision=jax.lax.Precision.HIGHEST,
    )
    if cell is not None:
        volume = jnp.abs(jnp.linalg.det(cell))
    else:
        volume = 1.0
    return virial / volume


def single_point(
    model,
    species: Array,
    coords: Array,
    cell: tp.Optional[Array] = None,
    pbc: tp.Optional[Array] = None,
    charge: int = 0,
    forces: bool = False,
    hessians: bool = False,
    atomic_energies: bool = False,
    ensemble_values: bool = False,
    vibrational: bool = False,
) -> tp.Dict[str, Array]:
    """Master single-point entry (reference ``grad.py:293-399``).

    Returns a dict with ``energies`` and any requested derived quantities.
    """
    out: tp.Dict[str, Array] = {}
    if ensemble_values:
        member_energies = model(
            species, coords, cell, pbc, charge=charge, ensemble_values=True
        )
        elem_idxs = model._convert(species)
        num_atoms = jnp.sum(elem_idxs >= 0, axis=-1)
        out["energies"] = jnp.mean(member_energies, axis=0)
        out["ensemble_energies"] = member_energies
        out["ensemble_std"] = jnp.std(member_energies, axis=0, ddof=1)
        out["qbcs"] = out["ensemble_std"] / jnp.sqrt(
            num_atoms.astype(member_energies.dtype)
        )
    else:
        out["energies"] = model(species, coords, cell, pbc, charge=charge)
    if atomic_energies:
        out["atomic_energies"] = model(
            species, coords, cell, pbc, charge=charge, atomic=True
        )
    if forces:
        g = jax.grad(_energy_sum, argnums=2)(model, species, coords, cell, pbc)
        out["forces"] = -g
    if hessians or vibrational:
        h = globals()["hessians"](model, species, coords, cell, pbc)
        out["hessians"] = h
        if vibrational:
            elem_idxs = model._convert(species)
            znums = species if model.periodic_table_index else jnp.asarray(
                model.atomic_numbers
            )[jnp.where(elem_idxs < 0, 0, elem_idxs)]
            masses = get_atomic_masses(znums)
            vib = vibrational_analysis(masses, h)
            out["freqs"] = vib.freqs
            out["modes"] = vib.modes
            out["force_constants"] = vib.fconstants
            out["reduced_masses"] = vib.rmasses
    return out
