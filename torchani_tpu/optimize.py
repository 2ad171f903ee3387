"""Geometry optimization (FIRE) — jitted, device-resident.

The reference CLI's ``ani opt`` is an unimplemented stub
(``/root/reference/torchani/cli.py:127``); this module provides a working
FIRE (Fast Inertial Relaxation Engine) minimizer with the whole iteration in
``lax.while_loop``.
"""

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

from torchani_tpu.annotations import Array

__all__ = ["FireState", "minimize_fire", "minimize_fire_batched"]


class FireState(struct.PyTreeNode):
    coords: Array  # (A, 3)
    velocities: Array
    forces: Array
    energy: Array
    dt: Array
    alpha: Array
    n_pos: Array
    step: Array
    fmax: Array


def minimize_fire(
    energy_fn: tp.Callable[[Array], Array],  # (A, 3) -> scalar energy
    coords: Array,
    max_steps: int = 500,
    fmax: float = 0.02,  # Hartree/Angstrom convergence threshold
    dt_start: float = 0.1,
    dt_max: float = 1.0,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
) -> FireState:
    """Minimize ``energy_fn`` with FIRE; runs fully inside one jit."""
    coords = jnp.asarray(coords)
    if coords.ndim == 3:
        coords = coords[0]

    grad_fn = jax.value_and_grad(energy_fn)

    def force_and_energy(x):
        e, g = grad_fn(x)
        return e, -g

    e0, f0 = force_and_energy(coords)
    init = FireState(
        coords=coords,
        velocities=jnp.zeros_like(coords),
        forces=f0,
        energy=e0,
        dt=jnp.asarray(dt_start),
        alpha=jnp.asarray(alpha_start),
        n_pos=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        fmax=jnp.max(jnp.abs(f0)),
    )

    def cond(st: FireState):
        return (st.step < max_steps) & (st.fmax > fmax)

    def body(st: FireState):
        v = st.velocities
        f = st.forces
        power = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-30
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v_mixed = (1 - st.alpha) * v + st.alpha * v_norm * f / f_norm
        uphill = power <= 0
        v = jnp.where(uphill, 0.0, v_mixed)
        n_pos = jnp.where(uphill, 0, st.n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(
            grow, jnp.minimum(st.dt * f_inc, dt_max),
            jnp.where(uphill, st.dt * f_dec, st.dt),
        )
        alpha = jnp.where(
            grow, st.alpha * f_alpha,
            jnp.where(uphill, alpha_start, st.alpha),
        )
        v = v + dt * f
        coords = st.coords + dt * v
        e, f_new = force_and_energy(coords)
        return FireState(
            coords=coords,
            velocities=v,
            forces=f_new,
            energy=e,
            dt=dt,
            alpha=alpha,
            n_pos=n_pos,
            step=st.step + 1,
            fmax=jnp.max(jnp.abs(f_new)),
        )

    return jax.jit(lambda s: jax.lax.while_loop(cond, body, s))(init)


def minimize_fire_batched(
    energy_fn: tp.Callable[[Array], Array],  # (C, A, 3) -> (C,) energies
    coords: Array,  # (C, A, 3)
    atom_mask: tp.Optional[Array] = None,  # (C, A) bool, True = real atom
    max_steps: int = 500,
    fmax: float = 0.02,
    dt_start: float = 0.1,
    dt_max: float = 1.0,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
) -> FireState:
    """Relax a whole conformer batch in one device program.

    Every FIRE control variable (dt, alpha, n_pos, convergence) is tracked
    per conformer, so each system follows its own adaptive schedule exactly
    as `minimize_fire` would — the batch axis just rides the same jitted
    SIMD program (the TPU-shaped analog of running the reference's ASE
    optimizer once per molecule).  Converged conformers are frozen in place
    while the rest keep iterating; the loop exits when all conformers reach
    ``fmax`` or ``max_steps``.

    Returns a `FireState` whose leaves carry a leading conformer axis;
    ``state.fmax <= fmax`` tells which conformers converged.
    """
    coords = jnp.asarray(coords)
    assert coords.ndim == 3, "expected (conformers, atoms, 3)"
    if atom_mask is None:
        atom_mask = jnp.ones(coords.shape[:2], bool)
    maskf = atom_mask[..., None].astype(coords.dtype)  # (C, A, 1)

    def _esum(c):
        e = energy_fn(c)
        return jnp.sum(e), e

    # sum-of-energies trick: conformers are independent, so the grad of the
    # summed batch energy IS each conformer's own force field
    grad_fn = jax.value_and_grad(_esum, has_aux=True)

    def force_and_energy(x):
        (_, e), g = grad_fn(x)
        return e, -g * maskf

    def per_conf_max(f):  # (C, A, 3) -> (C,)
        return jnp.max(jnp.abs(f), axis=(1, 2))

    e0, f0 = force_and_energy(coords)
    c = coords.shape[0]
    init = FireState(
        coords=coords,
        velocities=jnp.zeros_like(coords),
        forces=f0,
        energy=e0,
        dt=jnp.full((c,), dt_start, coords.dtype),
        alpha=jnp.full((c,), alpha_start, coords.dtype),
        n_pos=jnp.zeros((c,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        fmax=per_conf_max(f0),
    )

    def cond(st: FireState):
        return (st.step < max_steps) & jnp.any(st.fmax > fmax)

    def body(st: FireState):
        active = st.fmax > fmax  # (C,)
        v = st.velocities
        f = st.forces
        power = jnp.sum(f * v, axis=(1, 2))  # (C,)
        f_norm = jnp.sqrt(jnp.sum(f * f, axis=(1, 2))) + 1e-30
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2)))
        mix = (v_norm / f_norm)[:, None, None]
        v_mixed = (1 - st.alpha)[:, None, None] * v + st.alpha[:, None, None] * mix * f
        uphill = power <= 0  # (C,)
        v = jnp.where(uphill[:, None, None], 0.0, v_mixed)
        n_pos = jnp.where(uphill, 0, st.n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(
            grow, jnp.minimum(st.dt * f_inc, dt_max),
            jnp.where(uphill, st.dt * f_dec, st.dt),
        )
        alpha = jnp.where(
            grow, st.alpha * f_alpha,
            jnp.where(uphill, alpha_start, st.alpha),
        )
        v = (v + dt[:, None, None] * f) * active[:, None, None]
        coords = st.coords + dt[:, None, None] * v
        e, f_new = force_and_energy(coords)
        keep = ~active  # frozen conformers: state untouched
        return FireState(
            coords=jnp.where(keep[:, None, None], st.coords, coords),
            velocities=v,
            forces=jnp.where(keep[:, None, None], st.forces, f_new),
            energy=jnp.where(keep, st.energy, e),
            dt=jnp.where(keep, st.dt, dt),
            alpha=jnp.where(keep, st.alpha, alpha),
            n_pos=jnp.where(keep, st.n_pos, n_pos),
            step=st.step + 1,
            fmax=jnp.where(keep, st.fmax, per_conf_max(f_new)),
        )

    return jax.jit(lambda s: jax.lax.while_loop(cond, body, s))(init)
