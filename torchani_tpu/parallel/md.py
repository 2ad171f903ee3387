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
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from torchani_tpu.annotations import Array
from torchani_tpu.bucket_refresh import (
    BucketTables,
    _SENTINEL,
    cand_table_from_slots,
    select_slot_rows,
    slot_positions,
)
from torchani_tpu.md import MDState, MolecularDynamics, _refresh_neighbors
from torchani_tpu.neighbors import (
    Neighbors,
    narrow_to_cutoff,
    repack_to_capacity,
)
from torchani_tpu.utils import perm_gather

__all__ = ["ShardedMolecularDynamics"]


def _nnp_shard_energy(
    model, elem_rows, elem_full_flat, nbrs: Neighbors, present=None
):
    """NNP energy of one shard of atom rows (global neighbor indices)."""
    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    rn = narrow_to_cutoff(nbrs, aevc.radial.cutoff)
    an = narrow_to_cutoff(nbrs, aevc.angular.cutoff)
    cap = aevc._angular_capacity(nbrs.capacity, elem_rows.shape[0])
    if cap < an.capacity:
        an = repack_to_capacity(an, cap)
    aev = aevc._aev_flat(elem_full_flat, rn, an, present=present)
    overflow = nbrs.overflow | an.overflow
    aev = aev * jnp.where(overflow, jnp.float32(jnp.nan), jnp.float32(1.0))
    return nnp.neural_networks(elem_rows[None], aev[None])[0]


class ExchangeTables(BucketTables):
    """`BucketTables` plus the rebuild-time slot<->atom-row exchange maps
    of the domain-decomposed refresh (see
    ``ShardedMolecularDynamics._sharded_refresh_energy``).

    Subclassing keeps every single-device fallback path (``
    _refresh_neighbors``, the lane-select service) working unchanged.
    All shards/padding are static; ``t_cap`` rides in the shapes.
    """

    #: (G', C*K) int32 keys padded to the shard-divisible bucket count
    keys_pad: Array = None
    #: (G'*C,) int32 atom-of-slot padded with the sentinel A
    aos_pad: Array = None
    #: (G',) int32 occupied-lane count per bucket (chunk skipping)
    nlanes: Array = None
    #: (D, D*T) int32: per src shard, local slot-row index to place at
    #: flat send position dst*T + t (sentinel = slots-per-shard)
    send_idx: Array = None
    #: (D, G'C/D) int32: per src shard, each local slot row's flat send
    #: position (sentinel = D*T)
    send_inv: Array = None
    #: (D, R) int32: per dst shard, each atom row's flat recv position
    #: src*T + t (sentinel = D*T)
    recv_idx: Array = None
    #: (D, D*T) int32: per dst shard, each recv position's atom row
    #: (sentinel = R)
    recv_inv: Array = None


def _exchange_maps(slot_of_atom: Array, d: int, t_cap: int, gpc: int):
    """Rebuild-time routing tables for the slot-row all_to_all.

    Each occupied slot row (computed by the bucket-shard that owns the
    bucket) is read by exactly ONE atom row (its atom's row-shard), so the
    redistribution is a permutation: pack (gather) -> all_to_all ->
    unpack (gather), with `utils.perm_gather` keeping every AD order
    scatter-free.  ``t_cap`` bounds the rows any (src, dst) shard pair
    exchanges; overflow is flagged (loud, never wrong).
    """
    a = slot_of_atom.shape[0]
    r = a // d
    per = gpc // d
    valid = slot_of_atom >= 0
    slot = jnp.where(valid, slot_of_atom, gpc)
    src = jnp.minimum(slot // per, d - 1)
    dst = (jnp.arange(a, dtype=jnp.int32) // r).astype(jnp.int32)
    # rank t of each row within its (dst, src) group, in row order:
    # stable argsort by group key puts groups contiguous in row order;
    # cummax segment starts give within-group ranks (no searchsorted)
    key = jnp.where(valid, dst * d + src, d * d)
    order = jnp.argsort(key, stable=True)
    sk = jnp.take(key, order)
    pos = jnp.arange(a, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    rank_sorted = pos - seg_start.astype(jnp.int32)
    t_row = jnp.zeros((a,), jnp.int32).at[order].set(rank_sorted)
    overflow = jnp.any(valid & (t_row >= t_cap))
    t_row = jnp.minimum(t_row, t_cap - 1)

    dt = d * t_cap
    send_pos = dst * t_cap + t_row  # flat position within the src's buffer
    # send_idx[src, dst*T+t] = src-local slot index (sentinel per)
    flat_pos = src * dt + send_pos
    send_idx = (
        jnp.full((d * dt + 1,), per, jnp.int32)
        .at[jnp.where(valid, flat_pos, d * dt)]
        .set(jnp.where(valid, slot - src * per, per), mode="drop")[:-1]
        .reshape(d, dt)
    )
    # send_inv[src, local slot] = dst*T+t (sentinel dt)
    send_inv = (
        jnp.full((gpc + 1,), dt, jnp.int32)
        .at[jnp.where(valid, slot, gpc)]
        .set(jnp.where(valid, send_pos, dt), mode="drop")[:-1]
        .reshape(d, per)
    )
    # recv_idx[dst, local row] = src*T+t (sentinel dt)
    recv_idx = jnp.where(valid, src * t_cap + t_row, dt).reshape(d, r)
    # recv_inv[dst, src*T+t] = dst-local row (sentinel r)
    flat_recv = dst * dt + src * t_cap + t_row
    recv_inv = (
        jnp.full((d * dt + 1,), r, jnp.int32)
        .at[jnp.where(valid, flat_recv, d * dt)]
        .set(jnp.where(valid, pos % r, r), mode="drop")[:-1]
        .reshape(d, dt)
    )
    return send_idx, send_inv, recv_idx, recv_inv, overflow


class ShardedMolecularDynamics(MolecularDynamics):
    """`MolecularDynamics` with the NNP force evaluation sharded over atoms.

    Pass a 1D ``jax.sharding.Mesh`` (axis name ``atoms``); the atom count is
    padded to a multiple of the mesh size with ``-1`` dummy atoms (masked by
    the neighborlist, zero-energy in the networks).

    For periodic NNP-only systems on the bucket-dot refresh, the per-step
    Verlet REFRESH is domain-decomposed too (r5; SURVEY §2.3 item 5): the
    bucket-local select kernels run per bucket-shard, and the slot-row ->
    atom-row redistribution — a permutation, since each occupied slot
    feeds exactly one atom row — rides ONE ``all_to_all`` with
    rebuild-computed routing tables (`ExchangeTables`), scatter-free in
    both AD directions via `utils.perm_gather`.  The candidate-table
    rolls stay outside the shard_map so the partitioner inserts the
    boundary-plane halo exchanges itself.  Everything still replicated:
    the integrator, the cell-list rebuild, and (for heterogeneous
    models) the extra pair potentials — those models keep the replicated
    refresh path.
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
        #: (src,dst) exchange-row capacity of the sharded refresh; None
        #: until the first init measures the routing distribution
        self._exch_T: tp.Optional[int] = None
        super().__init__(model, species, **kwargs)
        try:
            aevc = self.model.aev_computer
            self._present = aevc._present_species(self.elem_idxs)
        except (AttributeError, KeyError):
            self._present = None

    def _only_nnp(self) -> bool:
        pots = getattr(self.model, "potentials", None)
        if not pots or "nnp" not in pots or not pots["nnp"].enabled:
            return False
        return all(
            name == "nnp" or not p.enabled for name, p in pots.items()
        )

    def _build_cache(self, coords: Array):
        (idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux) = (
            super()._build_cache(coords)
        )
        if self._exch_T is not None and type(tables) is BucketTables:
            from torchani_tpu.bucket_refresh import _occupied_lanes

            d = self.mesh.devices.size
            gx, gy, gz = tables.wrapshift.shape[:3]
            g = gx * gy * gz
            c = tables.atom_of_slot.shape[0] // g
            k = tables.keys.shape[1] // c
            gp = -(-g // d) * d
            a = coords.shape[0] if coords.ndim == 2 else coords.shape[1]
            keys_pad = jnp.pad(
                tables.keys, ((0, gp - g), (0, 0)), constant_values=_SENTINEL
            )
            aos_pad = jnp.pad(
                tables.atom_of_slot, (0, (gp - g) * c), constant_values=a
            )
            nlanes = _occupied_lanes(aos_pad, a, gp, c, k)
            sidx, sinv, ridx, rinv, ovf = _exchange_maps(
                tables.slot_of_atom, d, self._exch_T, gp * c
            )
            overflow = overflow | ovf
            tables = ExchangeTables(
                keys=tables.keys,
                atom_of_slot=tables.atom_of_slot,
                slot_of_atom=tables.slot_of_atom,
                wrap_offset=tables.wrap_offset,
                wrapshift=tables.wrapshift,
                keys_pad=keys_pad,
                aos_pad=aos_pad,
                nlanes=nlanes,
                send_idx=sidx,
                send_inv=sinv,
                recv_idx=ridx,
                recv_inv=rinv,
            )
        return idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux

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
        state = super().init(coords, *args, **kwargs)
        if (
            self._exch_T is None
            and type(state.bucket) is BucketTables
            and self._only_nnp()
        ):
            # measure the (src shard, dst shard) routing distribution of
            # the initial build and pin the static exchange capacity (the
            # same measure-at-first-init pattern as auto_capacity);
            # rebuild drift past the margin NaN-poisons via the maps
            soa = np.asarray(jax.device_get(state.bucket.slot_of_atom))
            d = self.mesh.devices.size
            a = soa.shape[0]
            r = a // d
            g = int(np.prod(state.bucket.wrapshift.shape[:3]))
            c = state.bucket.atom_of_slot.shape[0] // g
            per = (-(-g // d) * d) * c // d
            valid = soa >= 0
            src = np.minimum(soa[valid] // per, d - 1)
            dst = (np.arange(a) // r)[valid]
            counts = np.zeros((d, d), np.int64)
            np.add.at(counts, (dst, src), 1)
            self._exch_T = max(8, -(-int(counts.max() * 1.35 + 4) // 8) * 8)
            self._build_jit = None  # reprogram: tables gain exchange maps
            self._runner_cache = {}
            (idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux) = (
                self._build_cache_jit(state.coords)
            )
            state = state.replace(
                nbr_idx=idx, nbr_mask=mask, nbr_shift=shift,
                nbr_elem=nbr_elem, nbr_rev=rev, overflow=overflow,
                bucket=tables, ref_coords=state.coords, pair_aux=pair_aux,
            )
            e, f = jax.jit(self._energy_and_forces)(state, state.coords)
            state = state.replace(energy=e, forces=f)
        return state

    def _sharded_refresh_ef(self, state: MDState, coords: Array):
        """Domain-decomposed force evaluation (see class docstring)."""
        model = self.model
        elem = self.elem_idxs
        elem_flat = elem.reshape(-1)
        bucket: ExchangeTables = state.bucket
        d = self.mesh.devices.size
        axis = self.axis
        gx, gy, gz = bucket.wrapshift.shape[:3]
        g = gx * gy * gz
        c = bucket.atom_of_slot.shape[0] // g
        k = state.nbr_idx.shape[1]
        gp = bucket.keys_pad.shape[0]
        t_cap = bucket.send_idx.shape[1] // d
        k3 = k * 3

        def energy(cu):
            ci = self._to_internal(cu)
            canon = ci - bucket.wrap_offset
            posb = slot_positions(
                canon, bucket.atom_of_slot, bucket.slot_of_atom
            )
            cand3 = cand_table_from_slots(
                posb, bucket.wrapshift, (gx, gy, gz), c
            )
            if gp > g:
                cand3 = jnp.pad(cand3, ((0, gp - g), (0, 0), (0, 0), (0, 0)))

            def local(
                cand3_l, keys_l, nl_l, sidx, sinv, ridx, rinv,
                idx_l, mask_l, elem_l, can_l, erows,
            ):
                rows = select_slot_rows(cand3_l, keys_l, nl_l)  # (per, K*3)
                send = perm_gather(rows, sidx[0], sinv[0])  # (D*T, K*3)
                recv = jax.lax.all_to_all(
                    send.reshape(d, t_cap, k3), axis, 0, 0
                )
                nbr_rows = perm_gather(
                    recv.reshape(d * t_cap, k3), ridx[0], rinv[0]
                )  # (R, K*3)
                nbr_pos = nbr_rows.reshape(-1, k, 3)
                diff = nbr_pos - can_l[:, None, :]
                diff = jnp.where(mask_l[..., None], diff, 0.0)
                d2 = jnp.sum(diff * diff, axis=-1)
                dist = jnp.sqrt(jnp.where(mask_l, d2, 1.0))
                nb = Neighbors(
                    idx=idx_l, mask=mask_l, diff=diff, dist=dist,
                    overflow=state.overflow, elem=elem_l,
                )
                nb = narrow_to_cutoff(nb, self.cutoff)
                e = _nnp_shard_energy(
                    model, erows, elem_flat, nb, present=self._present
                )
                return jax.lax.psum(e, axis)

            sp = P(axis)
            e_nnp = jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(sp,) * 12,
                out_specs=P(),
                check_vma=False,
            )(
                cand3, bucket.keys_pad, bucket.nlanes, bucket.send_idx,
                bucket.send_inv, bucket.recv_idx, bucket.recv_inv,
                state.nbr_idx, state.nbr_mask, state.nbr_elem, canon,
                elem_flat,
            )
            shifter = model.energy_shifter
            if shifter is not None and shifter.enabled:
                e_nnp = e_nnp + jnp.sum(shifter(elem))
            return e_nnp

        e, grad_e = jax.value_and_grad(energy)(coords)
        return e, -grad_e

    def _energy_and_forces(self, state: MDState, coords: Array):
        if isinstance(state.bucket, ExchangeTables):
            return self._sharded_refresh_ef(state, coords)
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
