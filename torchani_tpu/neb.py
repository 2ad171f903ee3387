"""Nudged-elastic-band (NEB) transition-state search, whole band on device.

Beyond-reference capability (reference users run ASE's NEB one force call
per image, host-side): here the full band of I images is one ``(I, A)``
batch — every iteration evaluates all images' energies+forces in one SIMD
program, projects the NEB forces (improved tangents, spring forces, optional
climbing image), and advances a FIRE step, all inside a single jitted
``lax.while_loop``.

Standard formulation:
- improved tangent (Henkelman & Jonsson 2000): uphill neighbor difference,
  energy-weighted mix at extrema
- interior force = perpendicular true force + parallel spring force
- climbing image: the highest-energy interior image feels
  ``F - 2 (F . tau) tau`` and no spring (converges onto the saddle point)
- endpoints are frozen
"""

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

from torchani_tpu.annotations import Array

__all__ = ["NEBState", "neb_path"]


class NEBState(struct.PyTreeNode):
    images: Array  # (I, A, 3)
    energies: Array  # (I,)
    neb_forces: Array  # (I, A, 3) projected band forces (0 at endpoints)
    velocities: Array
    dt: Array
    alpha: Array
    n_pos: Array
    step: Array
    fmax: Array  # () max |neb force| over interior images


def _tangents(images: Array, energies: Array) -> Array:
    """Improved (energy-weighted) tangents for interior images, normalized.

    Returns (I-2, A, 3)."""
    r_prev = images[1:-1] - images[:-2]  # R_i - R_{i-1}
    r_next = images[2:] - images[1:-1]  # R_{i+1} - R_i
    e_prev, e_mid, e_next = energies[:-2], energies[1:-1], energies[2:]
    uphill = (e_next > e_mid) & (e_mid > e_prev)
    downhill = (e_next < e_mid) & (e_mid < e_prev)
    de_max = jnp.maximum(jnp.abs(e_next - e_mid), jnp.abs(e_prev - e_mid))
    de_min = jnp.minimum(jnp.abs(e_next - e_mid), jnp.abs(e_prev - e_mid))
    hi_next = e_next > e_prev
    w_next = jnp.where(hi_next, de_max, de_min)[:, None, None]
    w_prev = jnp.where(hi_next, de_min, de_max)[:, None, None]
    mix = w_next * r_next + w_prev * r_prev
    tau = jnp.where(
        uphill[:, None, None],
        r_next,
        jnp.where(downhill[:, None, None], r_prev, mix),
    )
    norm = jnp.sqrt(jnp.sum(tau * tau, axis=(1, 2), keepdims=True)) + 1e-30
    return tau / norm


def neb_path(
    energy_fn: tp.Callable[[Array], Array],  # (I, A, 3) -> (I,)
    images: Array,  # (I, A, 3) initial band incl. fixed endpoints
    k_spring: float = 0.1,  # Hartree / Angstrom^2
    climb: bool = True,
    max_steps: int = 500,
    fmax: float = 0.005,  # Hartree/Angstrom on the projected forces
    dt_start: float = 0.1,
    dt_max: float = 0.6,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
) -> NEBState:
    """Relax a band to the minimum-energy path; returns the final `NEBState`
    (``state.energies.argmax()`` is the transition-state image when
    ``climb=True``)."""
    images = jnp.asarray(images)
    assert images.ndim == 3 and images.shape[0] >= 3, "need >= 3 images"

    def _esum(x):
        e = energy_fn(x)
        return jnp.sum(e), e

    grad_fn = jax.value_and_grad(_esum, has_aux=True)

    def band_forces(x):
        (_, e), g = grad_fn(x)
        f_true = -g  # (I, A, 3)
        tau = _tangents(x, e)  # (I-2, A, 3)
        f_int = f_true[1:-1]
        f_par = jnp.sum(f_int * tau, axis=(1, 2), keepdims=True)
        # spring force along the tangent (standard NEB)
        len_next = jnp.sqrt(
            jnp.sum((x[2:] - x[1:-1]) ** 2, axis=(1, 2), keepdims=True)
        )
        len_prev = jnp.sqrt(
            jnp.sum((x[1:-1] - x[:-2]) ** 2, axis=(1, 2), keepdims=True)
        )
        f_neb = f_int - f_par * tau + k_spring * (len_next - len_prev) * tau
        if climb:
            # highest-energy interior image: full inverted-parallel force,
            # no spring — it climbs the band onto the saddle
            ci = jnp.argmax(e[1:-1])
            is_ci = (
                jnp.arange(f_neb.shape[0]) == ci
            )[:, None, None]
            f_climb = f_int - 2.0 * f_par * tau
            f_neb = jnp.where(is_ci, f_climb, f_neb)
        zeros = jnp.zeros_like(f_true[:1])
        return e, jnp.concatenate([zeros, f_neb, zeros], axis=0)

    e0, f0 = band_forces(images)
    init = NEBState(
        images=images,
        energies=e0,
        neb_forces=f0,
        velocities=jnp.zeros_like(images),
        dt=jnp.asarray(dt_start),
        alpha=jnp.asarray(alpha_start),
        n_pos=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        fmax=jnp.max(jnp.abs(f0)),
    )

    # global FIRE over the whole band (the ASE convention: one optimizer
    # state for all images; endpoints carry zero force so they never move)
    def cond(st: NEBState):
        return (st.step < max_steps) & (st.fmax > fmax)

    def body(st: NEBState):
        v, f = st.velocities, st.neb_forces
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
        x = st.images + dt * v
        e, f_new = band_forces(x)
        return NEBState(
            images=x,
            energies=e,
            neb_forces=f_new,
            velocities=v,
            dt=dt,
            alpha=alpha,
            n_pos=n_pos,
            step=st.step + 1,
            fmax=jnp.max(jnp.abs(f_new)),
        )

    return jax.jit(lambda s: jax.lax.while_loop(cond, body, s))(init)
