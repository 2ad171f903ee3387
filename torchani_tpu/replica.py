"""Replica-exchange (parallel-tempering) MD over a temperature ladder.

Beyond-reference capability (the reference delegates all MD to ASE, one
system at a time, ``/root/reference/torchani/ase.py:32-173``): here the
whole replica ladder rides the batched model API — R replicas of an A-atom
system are one ``(R, A)`` batch, every Langevin step is one SIMD program,
and the Metropolis swap moves run device-side between segments, so a full
parallel-tempering run is a single ``lax.scan`` with no host round-trips.

Designed for small/medium systems (all-pairs neighborlist per step; for
10k-atom boxes use `MolecularDynamics`, whose Verlet cell-list cache is the
right tool).  Swap moves exchange *configurations* between temperature-
adjacent replicas (velocities rescaled by sqrt(T_new/T_old)); acceptance is
the standard ``min(1, exp((beta_i - beta_j) (E_i - E_j)))``.
"""

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.md import ACCEL_UNIT, KB_HARTREE, maxwell_boltzmann_velocities
from torchani_tpu.utils import get_atomic_masses

__all__ = ["ReplicaExchange", "ReplicaState"]


class ReplicaState(struct.PyTreeNode):
    """Per-replica dynamic state (leaves carry a leading replica axis)."""

    coords: Array  # (R, A, 3)
    velocities: Array  # (R, A, 3)
    forces: Array  # (R, A, 3)
    energy: Array  # (R,)
    key: Array
    step: Array  # () int32, MD steps taken per replica
    swaps_attempted: Array  # () int32 (pair attempts, all segments)
    swaps_accepted: Array  # () int32
    segment: Array  # () int32 (for even/odd pairing alternation)


class ReplicaExchange:
    """Parallel-tempering driver: batched Langevin + device-side swaps.

    Args:
        model: an ANI-family model (called as ``model(elem, coords)``)
        species: atomic numbers, shape ``(A,)`` (same molecule per replica)
        temperatures: the ladder, one per replica (ascending recommended)
        timestep_fs: Langevin timestep
        friction_per_fs: BAOAB friction
        cell/pbc: optional periodic box (all-pairs PBC neighborlist)
    """

    def __init__(
        self,
        model,
        species,
        temperatures: tp.Sequence[float],
        timestep_fs: float = 0.5,
        friction_per_fs: float = 0.02,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
    ) -> None:
        znums = np.asarray(species).reshape(-1)
        self.n_replicas = len(tuple(temperatures))
        if self.n_replicas < 2:
            raise ValueError("replica exchange needs >= 2 replicas")
        self.temperatures = jnp.asarray(np.asarray(temperatures, np.float32))
        self.betas = 1.0 / (KB_HARTREE * self.temperatures)
        self.model = model
        # species stay a concrete host array: the model's _convert then runs
        # on host and every trace-time species specialization (packed
        # angular, static NN partition) survives the jit trace
        self.species = np.tile(znums, (self.n_replicas, 1))  # (R, A)
        self.masses = jnp.asarray(get_atomic_masses(znums))
        self.dt = float(timestep_fs)
        self.friction = float(friction_per_fs)
        self.cell = None if cell is None else jnp.asarray(cell)
        self.pbc = None if pbc is None else jnp.asarray(pbc)
        self._runners: tp.Dict[tp.Tuple[int, int], tp.Callable] = {}

    # ---- energetics ----
    def _energy_and_forces(self, coords: Array) -> tp.Tuple[Array, Array]:
        def esum(c):
            e = self.model(self.species, c, self.cell, self.pbc)
            return jnp.sum(e), e

        (_, e), g = jax.value_and_grad(esum, has_aux=True)(coords)
        return e, -g

    # ---- dynamics ----
    def init(self, coords: Array, seed: int = 0) -> ReplicaState:
        """Initial state. ``coords`` is ``(A, 3)`` (replicated) or
        ``(R, A, 3)``; velocities are Maxwell-Boltzmann at each replica's
        own ladder temperature."""
        coords = jnp.asarray(coords)
        if coords.ndim == 2:
            coords = jnp.tile(coords[None], (self.n_replicas, 1, 1))
        assert coords.shape[0] == self.n_replicas
        key = jax.random.PRNGKey(seed)
        key, vkey = jax.random.split(key)
        vkeys = jax.random.split(vkey, self.n_replicas)
        v = jax.vmap(
            lambda k, t: maxwell_boltzmann_velocities(k, self.masses, t)
        )(vkeys, self.temperatures)
        e, f = jax.jit(self._energy_and_forces)(coords)
        zero = jnp.zeros((), jnp.int32)
        return ReplicaState(
            coords=coords, velocities=v, forces=f, energy=e, key=key,
            step=zero, swaps_attempted=zero, swaps_accepted=zero, segment=zero,
        )

    def _step_langevin(self, st: ReplicaState) -> ReplicaState:
        dt = self.dt
        inv_m = (ACCEL_UNIT / self.masses)[None, :, None]
        key, nkey = jax.random.split(st.key)
        v = st.velocities + 0.5 * dt * st.forces * inv_m
        coords = st.coords + 0.5 * dt * v
        c1 = math.exp(-self.friction * dt)
        sigma = jnp.sqrt(
            (1 - c1**2)
            * KB_HARTREE
            * self.temperatures[:, None, None]
            / self.masses[None, :, None]
        ) * math.sqrt(ACCEL_UNIT)
        v = c1 * v + sigma * jax.random.normal(nkey, v.shape)
        coords = coords + 0.5 * dt * v
        e, f = self._energy_and_forces(coords)
        v = v + 0.5 * dt * f * inv_m
        return st.replace(
            coords=coords, velocities=v, forces=f, energy=e, key=key,
            step=st.step + 1,
        )

    # ---- swap move ----
    def _swap(self, st: ReplicaState) -> ReplicaState:
        r = self.n_replicas
        idx = jnp.arange(r)
        parity = st.segment % 2
        up = (idx - parity) % 2 == 0
        partner = jnp.where(up, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < r)
        partner = jnp.clip(partner, 0, r - 1)
        # both members of a pair compute the same symmetric delta and share
        # the pair-low random number, so their accept decisions agree
        delta = (self.betas[idx] - self.betas[partner]) * (
            st.energy[idx] - st.energy[partner]
        )
        key, ukey = jax.random.split(st.key)
        u = jax.random.uniform(ukey, (r,))
        u_pair = u[jnp.minimum(idx, partner)]
        accept = valid & (u_pair < jnp.exp(jnp.minimum(delta, 0.0)))
        perm = jnp.where(accept, partner, idx)
        vel_scale = jnp.sqrt(self.temperatures[idx] / self.temperatures[perm])
        n_pairs = jnp.sum(valid.astype(jnp.int32)) // 2
        n_acc = jnp.sum((accept & (partner > idx)).astype(jnp.int32))
        return st.replace(
            coords=st.coords[perm],
            velocities=st.velocities[perm] * vel_scale[:, None, None],
            forces=st.forces[perm],
            energy=st.energy[perm],
            key=key,
            swaps_attempted=st.swaps_attempted + n_pairs,
            swaps_accepted=st.swaps_accepted + n_acc,
            segment=st.segment + 1,
        )

    # ---- runner ----
    def run(
        self, state: ReplicaState, segments: int, steps_per_segment: int = 50
    ) -> ReplicaState:
        """Run ``segments`` x (``steps_per_segment`` Langevin steps + one
        swap sweep) as ONE device program (compiled once per shape and
        cached across calls)."""
        sig = (int(segments), int(steps_per_segment))
        runner = self._runners.get(sig)
        if runner is None:

            @jax.jit
            def runner(st):
                def inner(st, _):
                    return self._step_langevin(st), None

                def outer(st, _):
                    st, _ = jax.lax.scan(
                        inner, st, None, length=steps_per_segment
                    )
                    return self._swap(st), None

                st, _ = jax.lax.scan(outer, st, None, length=segments)
                return st

            self._runners[sig] = runner
        return runner(state)

    def acceptance_rate(self, state: ReplicaState) -> float:
        att = int(state.swaps_attempted)
        return float(state.swaps_accepted) / att if att else 0.0
