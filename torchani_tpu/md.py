"""Molecular dynamics: jitted integrators with Verlet-cached neighbors.

The reference runs MD through ASE's Python loop (one forward+backward per
femtosecond step, reference ``tools/md-benchmark.py:45-80``), with the
``VerletCellList`` skin cache (``neighbors.py:759-884``) skipping neighbor
rebuilds.  The TPU design puts the *whole* step inside ``jit`` — integrator,
skin check (`lax.cond`), force evaluation — so MD runs device-side with no
per-step Python/launch overhead; `run` drives many steps per host round-trip
via `lax.scan`.

Units: Angstrom, Hartree, AMU, femtoseconds.
"""

import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.bucket_refresh import (
    BucketTables,
    bucket_nbr_pos,
    make_wrapshift,
    tables_from_cell_aux,
)
from torchani_tpu.bucket_refresh_packed import (
    PackedTables,
    choose_span,
    pack_tables,
    packed_nbr_pos,
)
from torchani_tpu.neighbors import Neighbors, cell_list, _static_grid_shape
from torchani_tpu.utils import exact_matmul, get_atomic_masses

__all__ = [
    "CachedSinglePoint",
    "MDState",
    "MTSState",
    "MolecularDynamics",
    "MultipleTimestepMD",
    "maxwell_boltzmann_velocities",
    "kinetic_temperature",
]

#: Hartree/(Angstrom * AMU) -> Angstrom/fs^2
ACCEL_UNIT = 0.2625499785
#: Boltzmann constant in Hartree/K
KB_HARTREE = 3.166811563e-06
#: Hartree/Angstrom^3 -> bar
PRESSURE_UNIT_BAR = 4.35974465e7


class MDState(struct.PyTreeNode):
    """Dynamic MD state (a pytree; lives on device across steps)."""

    coords: Array  # (A, 3)
    velocities: Array  # (A, 3)
    forces: Array  # (A, 3)
    energy: Array  # ()
    # Verlet cache: neighbor topology built at cutoff + skin
    nbr_idx: Array  # (A, K)
    nbr_mask: Array  # (A, K)
    nbr_shift: Array  # (A, K, 3) cartesian image shifts ((1,1,3) in bucket mode)
    nbr_elem: Array  # (A, K) neighbor species (cached: topology-only)
    nbr_rev: Array  # (A, K) flat index of each lane's partner lane ((1,1) in bucket mode)
    ref_coords: Array  # (A, 3) coords at last rebuild
    rebuilds: Array  # () int32
    overflow: Array  # () bool
    key: Array  # PRNG key (for thermostats)
    step: Array  # () int32
    # Static species-sort permutation: the neighbor cache (and every table
    # derived from it) lives in species-sorted "internal" atom order, so the
    # NN's per-species row selections are contiguous slices instead of
    # strided gathers.  `coords`/`velocities`/`forces` stay in USER order;
    # `_refresh_neighbors` applies the permutation on entry and autodiff
    # routes forces back through it.  None = user order is already sorted.
    nbr_perm: tp.Optional[Array] = None
    # Bucket-dot refresh tables (periodic cell-list systems): when present,
    # the per-step diff recomputation runs as bucket-local one-hot MXU
    # contractions instead of per-row gathers (see bucket_refresh.py).
    # `PackedTables` selects the atom-packed kernel layout (~1.8x fewer
    # MACs; bucket_refresh_packed.py), `BucketTables` the slot-row layout.
    bucket: tp.Optional[tp.Union[BucketTables, PackedTables]] = None
    # Frozen per-window pair channels (dict: potential name -> (A, K, P)),
    # recomputed at every Verlet rebuild for potentials named in the
    # driver's ``freeze_pair_window`` (see `Neighbors.pair_aux`).  None
    # when the feature is off.
    pair_aux: tp.Optional[tp.Dict[str, Array]] = None
    # NPT: isotropic cell scale factor s (physical cell = s * init cell).
    # Neighbor topology is built from REDUCED coordinates (coords / s)
    # against the static init cell, so the compiled programs never see a
    # dynamic cell; physical pair vectors are s * reduced vectors.  None
    # (NVE/NVT) means s == 1 with no extra carry.
    scale: tp.Optional[Array] = None
    # Nose-Hoover chain state (2, M): row 0 = chain velocities (1/fs),
    # row 1 = chain positions (diagnostics only).  None until an NHC
    # runner installs it.
    nhc: tp.Optional[Array] = None


def maxwell_boltzmann_velocities(
    key: Array, masses: Array, temperature: float
) -> Array:
    """Sample velocities (Angstrom/fs) at a temperature (Kelvin)."""
    # v ~ N(0, sqrt(kB T / m)), in (Ha/amu)^(1/2) -> A/fs via sqrt(ACCEL_UNIT)
    # dummy atoms carry mass 0; give them zero velocity instead of inf
    safe_m = jnp.where(masses > 0, masses, 1.0)
    sigma = jnp.where(
        masses > 0, jnp.sqrt(KB_HARTREE * temperature / safe_m), 0.0
    )[:, None]
    v = jax.random.normal(key, masses.shape + (3,)) * sigma
    return v * math.sqrt(ACCEL_UNIT)


def kinetic_temperature(velocities: Array, masses: Array) -> Array:
    """Instantaneous kinetic temperature (Kelvin)."""
    ke = 0.5 * jnp.sum(masses[:, None] * velocities**2) / ACCEL_UNIT  # Hartree
    dof = 3 * velocities.shape[0]
    return 2 * ke / (dof * KB_HARTREE)


def _nhc_update(v, nhc, masses, dof, kt, q, dt2):
    """Half-step Nose-Hoover chain update (Martyna-Tuckerman-Klein).

    ``nhc`` (2, M): chain velocities / positions; ``q`` (M,) chain masses
    (Hartree * fs^2); ``kt`` Hartree; ``dt2`` fs (half the MD step).
    Unrolled over the (small, static) chain length; returns the scaled
    particle velocities and new chain state.  Reference: ASE exposes no
    NHC for the torchani Calculator — this is a capability extension.
    """
    m = q.shape[0]
    vx = [nhc[0, j] for j in range(m)]
    xx = [nhc[1, j] for j in range(m)]
    dt4, dt8 = dt2 / 2.0, dt2 / 4.0
    ke2 = jnp.sum(masses[:, None] * v**2) / ACCEL_UNIT  # 2 * KE, Hartree

    def g(j, ke2):
        if j == 0:
            return (ke2 - dof * kt) / q[0]
        return (q[j - 1] * vx[j - 1] ** 2 - kt) / q[j]

    # reverse sweep: update chain velocities tail -> head
    vx[m - 1] = vx[m - 1] + g(m - 1, ke2) * dt4
    for j in range(m - 2, -1, -1):
        e = jnp.exp(-dt8 * vx[j + 1])
        vx[j] = (vx[j] * e + g(j, ke2) * dt4) * e
    # scale particle velocities; chain positions advance (diagnostics)
    s = jnp.exp(-dt2 * vx[0])
    v = v * s
    ke2 = ke2 * s**2
    for j in range(m):
        xx[j] = xx[j] + dt2 * vx[j]
    # forward sweep head -> tail with the updated kinetic energy
    for j in range(m - 1):
        e = jnp.exp(-dt8 * vx[j + 1])
        vx[j] = (vx[j] * e + g(j, ke2) * dt4) * e
    vx[m - 1] = vx[m - 1] + g(m - 1, ke2) * dt4
    return v, jnp.stack([jnp.stack(vx), jnp.stack(xx)])


@jax.custom_vjp
def _gather_nbr_pos(coords, idx_safe, rev, mask):
    """``coords[idx]`` whose backward is a partner-lane *gather*, not a scatter.

    The vjp of a plain neighbor-position gather is a scatter-add of ~A*K tiny
    cotangent rows into (A, 3) — measured ~2x the cost of the forward gather
    on TPU (tools/refresh_microbench.py).  Because the full neighbor table is
    symmetric (every pair appears in both atoms' rows), Newton's third law
    gives the same result as a structured gather: the cotangent that lane
    (i, k) scatters to atom q = idx[i,k] is exactly the one atom q can *pull*
    from its own partner lane.  ``rev[q, k']`` holds the flat (i*K + k)
    position of row-(q, k')'s partner, computed once per Verlet rebuild.
    """
    return jnp.take(coords, idx_safe, axis=0)


def _gather_nbr_pos_fwd(coords, idx_safe, rev, mask):
    return _gather_nbr_pos(coords, idx_safe, rev, mask), (rev, mask)


def _gather_nbr_pos_bwd(res, g):
    rev, mask = res
    a, k = rev.shape
    gflat = g.reshape(a * k, 3)
    partner = jnp.take(gflat, jnp.where(mask, rev, 0), axis=0)  # (A, K, 3)
    partner = jnp.where(mask[..., None], partner, 0.0)
    return jnp.sum(partner, axis=1), None, None, None


_gather_nbr_pos.defvjp(_gather_nbr_pos_fwd, _gather_nbr_pos_bwd)


def _partner_lanes(
    idx: Array,  # (A, K)
    mask: Array,  # (A, K)
    image: Array,  # (A, K) int32 hashed integer image shift
    neg_image: Array,  # (A, K) hash of the negated shift
    block: int = 512,
) -> tp.Tuple[Array, Array]:
    """Flat partner-lane map: rev[i, k] = j*K + k' with idx[j,k'] == i and
    opposite image shift.  Returns (rev, all_found).

    The per-block row gathers dominate this map's cost, so (atom index,
    image hash, valid) are folded into ONE int32 key per lane — one gather
    of candidate rows instead of three (image hash < 125, atom index < 2^24:
    key = idx * 128 + hash, -1 for invalid lanes).
    """
    a, k = idx.shape
    idx_safe = jnp.where(mask, idx, 0)
    key = jnp.where(mask, idx * 128 + image, -1)  # (A, K)
    pad = (-a) % block
    rows = jnp.arange(a + pad, dtype=jnp.int32)

    def one_block(args):
        blk_mask, blk_safe, blk_neg, blk_rows = args
        cand_key = jnp.take(key, blk_safe, axis=0)  # (B, K, K)
        want = blk_rows[:, None] * 128 + blk_neg  # (B, K)
        match = cand_key == want[:, :, None]
        kprime = jnp.argmax(match, axis=2).astype(jnp.int32)  # (B, K)
        found = jnp.any(match, axis=2)
        rev = blk_safe * k + kprime
        return rev, found | ~blk_mask

    def pad0(x, fill):
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)

    args = (
        pad0(mask, False),
        pad0(idx_safe, 0),
        pad0(neg_image, 0),
        rows,
    )
    nblk = (a + pad) // block
    reshape = lambda x: x.reshape((nblk, block) + x.shape[1:])  # noqa: E731
    rev, found = jax.lax.map(
        one_block, tuple(reshape(x) for x in args)
    )
    rev = rev.reshape(a + pad, k)[:a]
    found = found.reshape(a + pad, k)[:a]
    return rev, jnp.all(found)


def _with_angular_preslice(model, prefix: int):
    """Return a model copy whose AEV computer pre-slices the (sorted) table."""
    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer.replace(angular_preslice=prefix)
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(aev_computer=aevc)
    return model.replace(potentials=pots)


def _with_angular_split(model, split: tp.Tuple[int, int]):
    """Return a model copy with the count-class angular split configured."""
    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer.replace(angular_split=split)
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(aev_computer=aevc)
    return model.replace(potentials=pots)


def _with_nn_precision(model, precision: str):
    """Return a model copy with the NN matmul precision set (if applicable)."""
    nnp = model.potentials["nnp"]
    nets = nnp.neural_networks
    if not hasattr(nets, "precision") or nets.precision == precision:
        return model
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(neural_networks=nets.replace(precision=precision))
    return model.replace(potentials=pots)


def _slice_lanes(nb: Neighbors, p: int) -> Neighbors:
    """Static lane-prefix view of a distance-sorted table (select service
    dropped: its tables describe the full lane layout)."""
    return Neighbors(
        idx=nb.idx[:, :p],
        mask=nb.mask[:, :p],
        diff=nb.diff[:, :p, :],
        dist=nb.dist[:, :p],
        overflow=nb.overflow,
        elem=None if nb.elem is None else nb.elem[:, :p],
    )


def _batch1(nb: Neighbors) -> Neighbors:
    """Leading molecule axis on the per-lane arrays only (the lane-select
    tables live in flat-atom space and must not be expanded)."""
    return nb.replace(
        idx=nb.idx[None],
        mask=nb.mask[None],
        diff=nb.diff[None],
        dist=nb.dist[None],
        elem=None if nb.elem is None else nb.elem[None],
    )


def _refresh_neighbors(
    state: MDState, coords: Array, scale: tp.Optional[Array] = None
) -> Neighbors:
    """Recompute differentiable diff/dist from cached topology.

    ``coords`` is in user order; the cached topology is in species-sorted
    internal order (see ``MDState.nbr_perm``), so the produced tables are
    internal-order rows matching the driver's (sorted) ``elem_idxs``.

    ``scale`` (NPT): ``coords`` are then REDUCED (physical / scale), the
    frame the cached topology lives in; physical diff vectors are exactly
    scale * reduced (isotropic cell scaling commutes with minimum-image
    shifts).  Differentiating the result wrt `scale` at fixed reduced
    coords is the scaling-trick virial.
    """
    if state.nbr_perm is not None:
        coords = jnp.take(coords, state.nbr_perm, axis=0)
    if state.bucket is not None:
        # bucket-dot path: the MXU contraction reproduces coords[idx] + shift
        # exactly (canonical coordinates; see bucket_refresh.py)
        canon = coords - state.bucket.wrap_offset
        if isinstance(state.bucket, PackedTables):
            k = state.nbr_idx.shape[1]
            nbr_pos = packed_nbr_pos(canon, state.bucket)[:, :k]
        else:
            nbr_pos = bucket_nbr_pos(
                canon,
                state.bucket.keys,
                state.bucket.atom_of_slot,
                state.bucket.slot_of_atom,
                state.bucket.wrapshift,
            )
        diff = nbr_pos - canon[:, None, :]
    else:
        nbr_pos = _gather_nbr_pos(
            coords,
            jnp.where(state.nbr_mask, state.nbr_idx, 0),
            state.nbr_rev,
            state.nbr_mask,
        )
        diff = nbr_pos - coords[:, None, :] + state.nbr_shift
    if scale is not None:
        diff = diff * scale
    diff = jnp.where(state.nbr_mask[..., None], diff, 0.0)
    d2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.where(state.nbr_mask, d2, 1.0))
    return Neighbors(
        idx=state.nbr_idx,
        mask=state.nbr_mask,
        diff=diff,
        dist=dist,
        overflow=state.overflow,
        elem=state.nbr_elem,
        # slot-layout bucket tables double as the scatter-free lane-select
        # service for runtime per-atom values (bucket_refresh.select_lane_values)
        select_tables=(
            state.bucket if isinstance(state.bucket, BucketTables) else None
        ),
    )


class MolecularDynamics:
    """MD driver for a single (optionally periodic) system.

    Builds jitted step functions around an `torchani_tpu.arch.ANI` model.
    The neighbor list is a cell list built at ``cutoff + skin`` and reused
    until any atom moves more than ``skin / 2`` (reference VerletCellList
    semantics), with the rebuild decision as a ``lax.cond`` inside the step.
    """

    def __init__(
        self,
        model,
        species: Array,  # (1, A) atomic numbers
        cell: tp.Optional[Array] = None,
        pbc: bool = False,
        skin: float = 0.75,
        capacity: tp.Optional[int] = None,
        bucket_capacity: tp.Optional[int] = None,
        timestep_fs: float = 1.0,
        nn_precision: str = "high",
        auto_capacity: bool = True,
        bucket_refresh: tp.Union[bool, str] = "auto",
        npt_compression: float = 0.0,
        freeze_pair_window: tp.Sequence[str] = (),
    ) -> None:
        # ctor snapshot (pre-wrapping model) for `rebaseline`
        self._ctor = dict(
            model=model, species=species, pbc=pbc, skin=skin,
            capacity=capacity, bucket_capacity=bucket_capacity,
            timestep_fs=timestep_fs, nn_precision=nn_precision,
            auto_capacity=auto_capacity, bucket_refresh=bucket_refresh,
            npt_compression=npt_compression,
            freeze_pair_window=freeze_pair_window,
        )
        # Window-constant pair channels: potentials named here (and
        # implementing `frozen_window_channels`) get their
        # topology-constant per-lane tables computed once per Verlet
        # REBUILD instead of re-gathered every force evaluation (D3's
        # element-pair constants + neighbor CN references — the folded
        # payload gather cluster profiled at ~8 ms of the config-5
        # slow-lane eval) and unlock the potential's restructured cached
        # math path.  EXACT — the channels are element-keyed constants.
        self._freeze_pair = tuple(
            n for n in freeze_pair_window
            if hasattr(
                getattr(model, "potentials", {}).get(n, None),
                "frozen_window_channels",
            )
        )
        # MD defaults the NN matmuls to "high" (3 bf16 MXU passes): max
        # relative force error ~3e-5 vs "highest" — far below thermal noise
        # and inside the reference's own 5e-4 infer-path tolerance
        # (tools/nn_precision_bench.py) — for ~2x faster NN evaluation.
        # Pass nn_precision="highest" for strict f32 parity.
        try:
            model = _with_nn_precision(model, nn_precision)
        except (AttributeError, KeyError):
            pass  # model without a standard nnp stack
        self.model = model
        self.species = jnp.asarray(species)
        self.elem_idxs = model.species_converter(self.species)
        # Species-sort the internal atom order (stable, so spatial locality
        # within a species block is kept): per-species NN row selections
        # become contiguous slices.  `elem_idxs` is INTERNAL order from here
        # on; user-facing arrays (coords/velocities/forces/masses) stay in
        # user order and `_refresh_neighbors`/`_build_cache` permute on entry.
        host_elem = np.asarray(jax.device_get(self.elem_idxs[0]))
        order = np.argsort(host_elem, kind="stable")
        if (order == np.arange(order.shape[0])).all():
            self._species_perm: tp.Optional[np.ndarray] = None
        else:
            self._species_perm = order.astype(np.int32)
            self.elem_idxs = jnp.asarray(
                np.asarray(jax.device_get(self.elem_idxs))[:, order]
            )
            host_elem = host_elem[order]
        # the internal element array is sorted: species-of-atom-index is a
        # step function, recorded statically for the nbr_elem fast path
        # (must be derived HERE — any op on `self.elem_idxs` inside the
        # traced `_build_cache` returns a tracer)
        if host_elem.size > 1 and np.all(np.diff(host_elem) >= 0):
            vals, starts = np.unique(host_elem, return_index=True)
            self._elem_steps: tp.Optional[tp.Tuple] = (
                tuple(int(v) for v in vals),
                tuple(int(s) for s in starts),
            )
        else:
            self._elem_steps = None
        self.cell = None if cell is None else jnp.asarray(cell)
        self.pbc = jnp.asarray([True, True, True]) if pbc else None
        self.skin = skin
        self.cutoff = model.cutoff
        self.dt = timestep_fs
        # NPT (run_npt_berendsen): neighbor topology is built from reduced
        # coordinates against the STATIC init cell, screened at a radius
        # inflated by the allowed linear compression, so the table still
        # covers the physical cutoff after the box shrinks by up to
        # `npt_compression` (1 - s_min).  0 (default) = NVE/NVT builds.
        if npt_compression and cell is None:
            raise ValueError("npt_compression requires a periodic cell")
        if not 0.0 <= npt_compression < 0.5:
            raise ValueError("npt_compression must be in [0, 0.5)")
        self._s_min = 1.0 - npt_compression
        self.build_radius = (self.cutoff + skin) / self._s_min
        if self.cell is not None:
            self._volume0 = float(
                abs(np.linalg.det(np.asarray(jax.device_get(self.cell))))
            )
        else:
            self._volume0 = 0.0
        znums = jnp.where(self.species[0] < 0, 0, self.species[0])
        masses = get_atomic_masses(znums)
        # dummy (-1) padding atoms feel zero force; unit mass keeps the
        # integrator's 1/m finite so they simply never move
        self.masses = jnp.where(self.species[0] < 0, 1.0, masses)
        a = self.species.shape[1]
        from torchani_tpu.neighbors import estimate_capacity

        self.capacity = capacity or estimate_capacity(
            self.build_radius, a, periodic=pbc
        )
        # auto_capacity: after the first build, shrink the static neighbor
        # capacity to the measured max occupancy (+12% and 4 lanes margin) —
        # every padded lane costs per-step gather rows.  Only when the user
        # didn't pin a capacity; overflow stays flagged either way.
        self._auto_capacity = auto_capacity and capacity is None
        self.bucket_capacity = bucket_capacity
        # Verlet-cache lanes are distance-sorted at build time, so any lane
        # that can come within the angular cutoff before the next rebuild
        # (build-dist <= r_ang + skin, by the same displacement bound as the
        # skin criterion) lives in a static prefix — the per-step angular
        # repack then scans ~56 lanes instead of the full radial capacity.
        # The bound is verified per build (overflow flag) in _build_cache.
        self._ang_prefix: tp.Optional[int] = None
        # NPT: the preslice bound check compares REDUCED build distances
        # against a physical angular reach; under a shrinking box the static
        # prefix is no longer provably sufficient — skip it (perf-only
        # feature) rather than carry a scale-dependent bound.
        if not npt_compression and self._nnp_enabled():
            try:
                aevc = self.model.aev_computer
                r_ang = float(aevc.angular.cutoff)
                prefix = estimate_capacity(r_ang + skin, a, periodic=pbc)
                if prefix < self.capacity:
                    self._ang_prefix = prefix
                    self.model = _with_angular_preslice(self.model, prefix)
            except (AttributeError, KeyError):
                pass  # model without a standard nnp/aev stack
        # Per-POTENTIAL static lane prefixes: when a long-cutoff potential
        # (e.g. D3 dispersion at 8 A) inflates the build radius, the
        # short-cutoff potentials (NNP AEV at 5.2, repulsion) must not pay
        # the widened K — their reach lives in a static prefix of the
        # distance-sorted lanes (same displacement bound + per-build
        # verification as the angular preslice).  The energy closure then
        # dispatches each potential on its own lane slice.
        self._lane_prefixes: tp.Dict[str, int] = {}
        self._prefix_checks: tp.List[tp.Tuple[float, int]] = []
        if not npt_compression:
            for pname, pot in getattr(self.model, "potentials", {}).items():
                r_pot = float(pot.cutoff)
                if not pot.enabled or not math.isfinite(r_pot):
                    continue
                if r_pot + skin >= self.cutoff + skin - 1e-9:
                    continue  # already the build cutoff
                p = estimate_capacity(r_pot + skin, a, periodic=pbc)
                if p < self.capacity:
                    self._lane_prefixes[pname] = p
            for p in sorted(set(self._lane_prefixes.values())):
                r_phys = max(
                    float(self.model.potentials[n].cutoff)
                    for n, pp in self._lane_prefixes.items()
                    if pp == p
                )
                self._prefix_checks.append((r_phys, p))
        # bucket-dot refresh (periodic systems): replace the per-step
        # neighbor-position row gather + its backward with bucket-local
        # one-hot MXU contractions (bucket_refresh.py).  "auto" = on for
        # periodic cells; slot capacity is measured at the first init.
        # "packed"/auto additionally repack kernel rows by atom instead of
        # (bucket, slot) — ~1.8x fewer MACs (bucket_refresh_packed.py);
        # "slot" pins the slot-row layout.
        self._bucket_on = (
            bool(bucket_refresh) if bucket_refresh != "auto" else cell is not None
        ) and cell is not None
        self._bucket_packed = bucket_refresh == "packed"
        self._bucket_c: tp.Optional[int] = None
        self._bucket_span: tp.Optional[tp.Tuple[int, int]] = None
        self._angular_split_done = False
        self._wrapshift: tp.Optional[np.ndarray] = None
        self._valid_atom = host_elem >= 0
        # thermostat/barostat degrees of freedom: real atoms only (dummies
        # carry zero velocity and zero force throughout)
        self._n_real = int(self._valid_atom.sum())
        if self.cell is not None:
            self.grid_shape = _static_grid_shape(
                np.asarray(jax.device_get(self.cell)), self.build_radius
            )
        else:
            # Non-periodic: fix the bucket-grid shape from the initial extent
            # (the bounding cell itself is recomputed dynamically each build;
            # a fixed grid shape only affects bucket occupancy, not results).
            self.grid_shape = None

    def _nnp_enabled(self) -> bool:
        try:
            return bool(self.model.potentials["nnp"].enabled)
        except (AttributeError, KeyError):
            return True  # non-standard stack: don't skip anything

    def _ensure_grid(self, coords: Array) -> None:
        if self.grid_shape is None and self.cell is None:
            extent = np.asarray(jax.device_get(coords)).reshape(-1, 3)
            span = extent.max(axis=0) - extent.min(axis=0) + 2e-3
            cell = np.diag(np.maximum(span, self.build_radius))
            self.grid_shape = _static_grid_shape(cell, self.build_radius)

    def _bucket_histogram(self, coords: Array) -> tp.Optional[np.ndarray]:
        """(G,) atoms-per-bucket of the initial configuration (host numpy).

        None when there is no periodic cell to bin against (the grid is then
        span-derived and the auto bucket heuristic is the only option).
        """
        if self.cell is None:
            return None
        cell = np.asarray(jax.device_get(self.cell), np.float64)
        gx, gy, gz = self.grid_shape
        pos = np.asarray(jax.device_get(coords), np.float64).reshape(-1, 3)
        if self._species_perm is not None:
            pos = pos[np.asarray(self._species_perm)]
        pos = pos[self._valid_atom]
        u = pos @ np.linalg.inv(cell)
        m = np.clip(u - np.floor(u), 0.0, 1.0 - 1e-9)
        idx3 = np.minimum(
            (m * np.array([gx, gy, gz])).astype(np.int64),
            np.array([gx, gy, gz]) - 1,
        )
        bucket = (idx3[:, 0] * gy + idx3[:, 1]) * gz + idx3[:, 2]
        return np.bincount(bucket, minlength=gx * gy * gz)

    def _measure_occupancy(self, coords: Array) -> tp.Optional[int]:
        """Max atoms-per-bucket of the initial configuration (host numpy)."""
        counts = self._bucket_histogram(coords)
        return None if counts is None else int(counts.max())

    def _ensure_bucket_capacity(self, coords: Array) -> None:
        """Pin the cell list's bucket capacity to measured occupancy.

        The auto heuristic (2x mean occupancy) under-allocates for clustered
        configurations (e.g. a sparse lattice with locally-liquid pockets),
        which would flag overflow at the very first build and NaN-guard the
        trajectory.  Measuring is a cheap host pass; overflow during the run
        (density drift) is still flagged per rebuild.
        """
        if self.bucket_capacity is not None:
            return
        occ = self._measure_occupancy(coords)
        if occ is not None:
            # same margin as the lane-capacity auto-tune; for the 10k water
            # box this lands on the old 2x-mean heuristic's 64 exactly
            self.bucket_capacity = int(-(-int(occ * 1.12 + 2) // 8) * 8)

    def _ensure_bucket(self, coords: Array) -> None:
        """Fix the bucket-dot slot capacity from the initial occupancy (host).

        ``c`` gets a margin over the measured max atoms-per-bucket (density
        fluctuations during MD), rounded up so ``c * K`` is a 128-lane
        multiple (the Pallas kernels chunk the lane axis in 128s).  Later
        overflow is caught by the per-rebuild ``overflow`` flag.
        """
        if not self._bucket_on or self._bucket_c is not None:
            return
        if min(self.grid_shape) < 3:
            # cell_list falls back to all-pairs images here (no bucket aux)
            self._bucket_on = False
            return
        counts = self._bucket_histogram(coords)
        if counts is None:
            self._bucket_on = False
            return
        occ = int(counts.max())
        cell = np.asarray(jax.device_get(self.cell), np.float64)
        # modest margin: the multiple-of-`step` round-up adds headroom of its
        # own, and overflow is flagged per rebuild (kernel cost ~ c)
        want = int(occ * 1.08 + 2)
        step = -(-128 // math.gcd(self.capacity, 128) // 16) * 16
        c = -(-want // step) * step
        if c > 256:  # kernel key encoding caps rank at 8 bits
            self._bucket_on = False
            return
        self._bucket_c = c
        if self._bucket_packed:
            # static (buckets-per-span, rows-per-span) for the atom-packed
            # kernel layout, measured like the other capacity auto-tunes
            try:
                kl = -(-self.capacity // 128) * 128
                self._bucket_span = choose_span(self.grid_shape, counts, c, kl)
            except ValueError:
                self._bucket_packed = False
        self._wrapshift = make_wrapshift(self.grid_shape, cell)
        # the build program's output structure now includes the tables
        self._build_jit = None

    def _ensure_angular_split(self, state: "MDState", coords: Array) -> None:
        """Configure the count-class angular split from measured counts.

        In a liquid most atoms have far fewer angular-range neighbors than
        the worst-case capacity the static table must hold, and angular
        pair work scales ~capacity^2.  Measure the count distribution of
        the initial configuration once (host fetch of one (A,) vector),
        pick the (k_small, n_dense) pair minimizing estimated pair-lane
        work with a drift margin, and rebuild the model with
        ``aev_computer.angular_split`` set (aev/computer.py).  Runtime
        violations of the static class capacity NaN-poison the trajectory
        like every other capacity overflow.
        """
        if self._angular_split_done:
            return
        self._angular_split_done = True
        if not self._nnp_enabled():
            return  # AEV never runs (e.g. the MTS slow-lane driver)
        a = int(coords.shape[0])
        if a < 2048:
            return  # small systems: the split's sort overhead dominates
        try:
            aevc = self.model.aev_computer
            r_ang = float(aevc.angular.cutoff)
            cap = aevc._angular_capacity(self.capacity, a)
        except (AttributeError, KeyError):
            return
        if cap < 16:
            return
        from torchani_tpu.neighbors import narrow_to_cutoff

        def _counts(st, c):
            nb = narrow_to_cutoff(_refresh_neighbors(st, c), r_ang)
            return jnp.sum(nb.mask, axis=1)

        counts = np.minimum(
            np.asarray(jax.device_get(jax.jit(_counts)(state, coords))), cap
        )
        kp = lambda k: k * (k - 1) / 2.0  # noqa: E731
        base = a * kp(cap)
        best = None
        for k_small in range(8, cap - 3, 2):
            over = int((counts > k_small).sum())
            n_dense = int(-(-int(over * 1.3 + 64) // 64) * 64)
            if n_dense >= a:
                continue
            cost = n_dense * kp(cap) + (a - n_dense) * kp(k_small)
            if best is None or cost < best[0]:
                best = (cost, k_small, n_dense)
        if best is None or best[0] > 0.85 * base:
            return  # <15% estimated saving: not worth the per-step sort
        _, k_small, n_dense = best
        self.model = _with_angular_split(self.model, (k_small, n_dense))
        self._runner_cache = {}

    def _to_internal(self, coords: Array) -> Array:
        if self._species_perm is None:
            return coords
        return jnp.take(coords, jnp.asarray(self._species_perm), axis=0)

    def _build_cache_jit(self, coords: Array):
        """Jitted `_build_cache` for the eager entry points (`init`).

        Eager execution would dispatch the build op-by-op on device (slow
        over the tunnel) and *materialize* the pack contraction's
        (A, 27*B, K) selector, which only exists virtually inside a fused
        XLA reduction (several GB if materialized).
        """
        fn = getattr(self, "_build_jit", None)
        if fn is None:
            fn = jax.jit(self._build_cache)
            self._build_jit = fn
        return fn(coords)

    # ---- neighbor (re)builds ----
    def _build_cache(self, coords: Array):
        coords = self._to_internal(coords)
        bucket_on = self._bucket_c is not None
        built = cell_list(
            self.build_radius,
            self.elem_idxs,
            coords[None],
            self.cell,
            self.pbc,
            capacity=self.capacity,
            bucket_capacity=self._bucket_c
            if bucket_on
            else self.bucket_capacity,
            grid_shape=self.grid_shape,
            bucket_aux=bucket_on,
        )
        nbrs, aux = built if bucket_on else (built, None)
        idx = nbrs.idx[0]
        mask = nbrs.mask[0]
        dist = nbrs.dist[0]
        overflow = nbrs.overflow
        if bucket_on:
            # the bucket-dot refresh never reads cached shifts (section
            # shifts live in the static wrapshift table), so the (A, K)
            # neighbor-position gather reconstructing them is skipped
            keys_atom = aux["keys"]
            # broadcastable placeholder: nothing reads shifts in bucket mode,
            # and a full (A, K, 3) zeros would ride the MD scan carry (~14 MB)
            shift = jnp.zeros((1, 1, 3), coords.dtype)
        else:
            # reconstruct cartesian shifts: diff - (x_j - x_i)
            nbr_pos = jnp.take(coords, jnp.where(mask, idx, 0), axis=0)
            shift = nbrs.diff[0] - (nbr_pos - coords[:, None, :])
            shift = jnp.where(mask[..., None], shift, 0.0)
        if self._ang_prefix is not None or self._lane_prefixes:
            # Sort lanes by build distance (amortized over the Verlet window)
            # so every short-reach lane set occupies a static prefix; verify
            # each prefix bound actually holds for this build.  The
            # permutation is applied as a one-hot contraction
            # (`lane_permute`): per-row take_along_axis lane gathers are
            # pathological on TPU.
            from torchani_tpu.neighbors import lane_permute

            k = idx.shape[-1]
            keys = jnp.where(mask, dist, jnp.inf)
            _, order = jax.lax.top_k(-keys, k)
            # finite sentinel for masked lanes: the contraction multiplies
            # masked-out lanes by 0.0, and 0 * inf would poison the sums
            if bucket_on:
                idx, mask, keys_atom, skeys = lane_permute(
                    (idx, mask, keys_atom, jnp.where(mask, dist, 1e30)), order
                )
            else:
                idx, mask, shift, skeys = lane_permute(
                    (idx, mask, shift, jnp.where(mask, dist, 1e30)), order
                )
            dist = jnp.where(mask, skeys, 1.0)  # keep dist lane-aligned
            if self._ang_prefix is not None:
                r_ang = float(self.model.aev_computer.angular.cutoff)
                in_reach = jnp.sum(
                    mask & (skeys <= r_ang + self.skin), axis=-1
                )
                overflow = overflow | jnp.any(in_reach > self._ang_prefix)
            for r_phys, p in self._prefix_checks:
                cnt = jnp.sum(mask & (skeys <= r_phys + self.skin), axis=-1)
                overflow = overflow | jnp.any(cnt > p)
        # cache neighbor species: topology-only, so the per-step force path
        # skips the (A, K) dynamic species gather entirely.  With the
        # species-sorted internal order, species-of-atom-index is a step
        # function (static table from __init__): a few (A, K) compares
        # replace a 1.36M-element gather (9.7 ms of the rebuild at 10k).
        if self._elem_steps is not None:
            vals, starts = self._elem_steps
            nbr_elem = jnp.full(idx.shape, vals[0], jnp.int32)
            for v, s in zip(vals[1:], starts[1:]):
                nbr_elem = jnp.where(idx >= s, v, nbr_elem)
        else:
            nbr_elem = jnp.take(
                self.elem_idxs[0], jnp.where(mask, idx, 0), axis=0
            )
        nbr_elem = jnp.where(mask, nbr_elem, -1)
        # frozen per-window pair channels (see freeze_pair_window): computed
        # from the BUILD-TIME distances — exactly the configuration every
        # other cached quantity reflects
        pair_aux = None
        if self._freeze_pair:
            nb_build = Neighbors(
                idx=idx,
                mask=mask,
                diff=jnp.zeros(idx.shape + (3,), coords.dtype),
                dist=jnp.where(mask, dist, 1.0),
                overflow=overflow,
                elem=nbr_elem,
            )
            elem_flat = self.elem_idxs.reshape(-1)
            pair_aux = {}
            for n in self._freeze_pair:
                ch = self.model.potentials[n].frozen_window_channels(
                    elem_flat, nb_build
                )
                if ch is not None:
                    pair_aux[n] = ch
            pair_aux = pair_aux or None
        if bucket_on:
            # bucket-dot refresh: the per-step path never touches nbr_rev
            # (backward is the transposed contraction), so the partner-lane
            # map — the most expensive part of the rebuild — is skipped.
            tables = tables_from_cell_aux(
                keys_atom,
                mask,
                aux["atom_of_slot"],
                aux["slot_of_atom"],
                coords - aux["central"],
                jnp.asarray(self._wrapshift),
                self._bucket_c,
            )
            if self._bucket_span is not None:
                tables, povf = pack_tables(tables, *self._bucket_span)
                overflow = overflow | povf
            rev = jnp.zeros((1, 1), jnp.int32)  # unused in bucket mode
            return idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux
        # partner-lane map for the scatter-free force backward: hash each
        # lane's integer image shift so partners are matched exactly
        if self.cell is not None:
            frac = jnp.round(exact_matmul(shift, jnp.linalg.inv(self.cell)))
            n = jnp.clip(frac, -2, 2).astype(jnp.int32)
        else:
            n = jnp.zeros(shift.shape, jnp.int32)
        h = ((n[..., 0] + 2) * 5 + (n[..., 1] + 2)) * 5 + (n[..., 2] + 2)
        hneg = ((-n[..., 0] + 2) * 5 + (-n[..., 1] + 2)) * 5 + (-n[..., 2] + 2)
        rev, all_found = _partner_lanes(idx, mask, h, hneg)
        overflow = overflow | ~all_found
        return idx, mask, shift, nbr_elem, rev, overflow, None, pair_aux

    def _potential_energy(
        self,
        nb: Neighbors,
        cs: Array,
        pair_aux: tp.Optional[tp.Dict[str, Array]] = None,
    ) -> Array:
        """Total potential energy from a refreshed table (internal order).

        Without lane prefixes this is exactly
        ``model.compute_from_neighbors``; with them (a long-cutoff
        potential inflated the build radius, e.g. D3 dispersion at 8 A)
        each short-cutoff potential runs on its own STATIC prefix of the
        distance-sorted lanes instead of the full widened K — verified per
        build like the angular preslice.  ``pair_aux`` (state-carried
        frozen window channels, see ``freeze_pair_window``) is re-attached
        per potential."""
        from torchani_tpu.neighbors import narrow_to_cutoff

        if not self._lane_prefixes and not self._freeze_pair:
            nbn = narrow_to_cutoff(nb, self.cutoff)
            out = self.model.compute_from_neighbors(
                self.elem_idxs, cs[None], _batch1(nbn)
            )
            return jnp.sum(out.energies)
        e = jnp.asarray(0.0, jnp.float32)
        for name, pot in sorted(self.model.potentials.items()):
            if not pot.enabled:
                continue
            p = self._lane_prefixes.get(name)
            nbp = _slice_lanes(nb, p) if p is not None else nb
            r = min(float(pot.cutoff), self.cutoff)
            nbp = narrow_to_cutoff(nbp, r)
            if pair_aux is not None and name in pair_aux:
                aux = pair_aux[name]
                if p is not None:
                    aux = aux[:, :p]
                nbp = nbp.replace(pair_aux=aux)
            e = e + jnp.sum(
                pot.compute_from_neighbors(
                    self.elem_idxs, cs[None], _batch1(nbp)
                ).energies
            )
        shifter = self.model.energy_shifter
        if shifter is not None and shifter.enabled:
            e = e + jnp.sum(shifter(self.elem_idxs))
        return e

    def _energy_and_forces(self, state: MDState, coords: Array):
        def energy(c):
            nb = _refresh_neighbors(state, c)
            return self._potential_energy(
                nb, self._to_internal(c), state.pair_aux
            )

        e, g = jax.value_and_grad(energy)(coords)
        return e, -g

    def _energy_forces_virial(self, state: MDState, coords: Array, scale):
        """Energy, forces and dU/dscale in ONE backward pass (NPT).

        Evaluated in the REDUCED frame: pair vectors are scale * reduced,
        so differentiating the scalar energy wrt the scale argument at
        fixed reduced coordinates yields the pair virial
        G = sum_pairs r_ij . dU/dr_ij = scale * dU/dscale with no extra
        evaluation — the stress "scaling trick" (reference ase.py:50-53)
        fused into the force backward.  Physical forces are the reduced
        gradient divided by scale.
        """
        def energy(c_red, s):
            nb = _refresh_neighbors(state, c_red, s)
            return self._potential_energy(
                nb, self._to_internal(c_red * s), state.pair_aux
            )

        e, (gr, gs) = jax.value_and_grad(energy, argnums=(0, 1))(
            coords / scale, scale
        )
        return e, -gr / scale, gs

    def init(
        self,
        coords: Array,  # (A, 3) or (1, A, 3)
        temperature: tp.Optional[float] = None,
        key: tp.Optional[Array] = None,
    ) -> MDState:
        coords = jnp.asarray(coords)
        if coords.ndim == 3:
            coords = coords[0]
        self._ensure_grid(coords)
        self._ensure_bucket_capacity(coords)  # before any build runs
        if self._auto_capacity:
            self._auto_capacity = False  # measure once, on the first init
            _, mask0, *_ = self._build_cache_jit(coords)
            occ = int(jax.device_get(jnp.max(jnp.sum(mask0, axis=-1))))
            tight = int(-(-int(occ * 1.12 + 4) // 8) * 8)
            if tight < self.capacity:
                self.capacity = tight
                self._build_jit = None  # drop programs compiled at the old K
                self._runner_cache = {}
        self._ensure_bucket(coords)  # after the final K is known
        key = key if key is not None else jax.random.PRNGKey(0)
        key, vkey = jax.random.split(key)
        if temperature is not None:
            velocities = maxwell_boltzmann_velocities(vkey, self.masses, temperature)
        else:
            velocities = jnp.zeros_like(coords)
        (idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux) = (
            self._build_cache_jit(coords)
        )
        state = MDState(
            coords=coords,
            velocities=velocities,
            forces=jnp.zeros_like(coords),
            energy=jnp.zeros(()),
            nbr_idx=idx,
            nbr_mask=mask,
            nbr_shift=shift,
            nbr_elem=nbr_elem,
            nbr_rev=rev,
            ref_coords=coords,
            rebuilds=jnp.zeros((), jnp.int32),
            overflow=overflow,
            key=key,
            step=jnp.zeros((), jnp.int32),
            nbr_perm=None
            if self._species_perm is None
            else jnp.asarray(self._species_perm),
            bucket=tables,
            pair_aux=pair_aux,
        )
        self._ensure_angular_split(state, coords)
        e, f = jax.jit(self._energy_and_forces)(state, coords)
        return state.replace(energy=e, forces=f)

    def _maybe_rebuild(self, state: MDState, coords: Array) -> MDState:
        # Rigorous Verlet criterion: a pair can only have closed the skin gap
        # when the SUM of the two largest per-atom displacements exceeds the
        # skin — strictly less conservative than 2*max > skin, so rebuilds
        # are ~30% rarer at the same correctness guarantee.
        #
        # NPT (scale s tracked in state): the table was built in reduced
        # coordinates at screen radius `build_radius`, so it covers physical
        # pair distances up to s * build_radius; the available gap to the
        # physical cutoff is s * build_radius - cutoff (reduces to `skin`
        # at s == 1 and build_radius == cutoff + skin).  Displacements are
        # measured on physical coords — the barostat's affine motion is
        # already charged to the s term, so this double-counts it, which is
        # strictly conservative.
        moved2 = jnp.sum((coords - state.ref_coords) ** 2, axis=-1)
        top2, _ = jax.lax.top_k(moved2, 2)
        if state.scale is None:
            gap = self.build_radius - self.cutoff
        else:
            gap = state.scale * self.build_radius - self.cutoff
        need = jnp.sqrt(top2[0]) + jnp.sqrt(top2[1]) > gap

        def rebuild(st):
            red = coords if st.scale is None else coords / st.scale
            (idx, mask, shift, nbr_elem, rev, overflow, tables, pair_aux) = (
                self._build_cache(red)
            )
            if st.scale is not None:
                # a fresh build can no longer cover the physical cutoff once
                # the box has compressed past the npt_compression margin
                overflow = overflow | (
                    st.scale * self.build_radius < self.cutoff
                )
            return st.replace(
                nbr_idx=idx,
                nbr_mask=mask,
                nbr_shift=shift,
                nbr_elem=nbr_elem,
                nbr_rev=rev,
                ref_coords=coords,
                rebuilds=st.rebuilds + 1,
                overflow=st.overflow | overflow,
                bucket=tables,
                pair_aux=pair_aux,
            )

        return jax.lax.cond(need, rebuild, lambda st: st, state)

    # ---- integrators ----
    def step_nve(self, state: MDState) -> MDState:
        """One Velocity-Verlet step."""
        dt = self.dt
        inv_m = (ACCEL_UNIT / self.masses)[:, None]
        v_half = state.velocities + 0.5 * dt * state.forces * inv_m
        coords = state.coords + dt * v_half
        state = self._maybe_rebuild(state, coords)
        e, f = self._energy_and_forces(state, coords)
        v = v_half + 0.5 * dt * f * inv_m
        return state.replace(
            coords=coords, velocities=v, forces=f, energy=e, step=state.step + 1
        )

    def step_langevin(
        self, state: MDState, temperature: float, friction_per_fs: float = 0.01
    ) -> MDState:
        """One BAOAB Langevin (NVT) step."""
        dt = self.dt
        inv_m = (ACCEL_UNIT / self.masses)[:, None]
        key, nkey = jax.random.split(state.key)
        v = state.velocities + 0.5 * dt * state.forces * inv_m
        coords = state.coords + 0.5 * dt * v
        c1 = math.exp(-friction_per_fs * dt)
        sigma = jnp.sqrt(
            (1 - c1**2) * KB_HARTREE * temperature / self.masses
        )[:, None] * math.sqrt(ACCEL_UNIT)
        v = c1 * v + sigma * jax.random.normal(nkey, v.shape)
        coords = coords + 0.5 * dt * v
        state = state.replace(key=key)
        state = self._maybe_rebuild(state, coords)
        e, f = self._energy_and_forces(state, coords)
        v = v + 0.5 * dt * f * inv_m
        return state.replace(
            coords=coords, velocities=v, forces=f, energy=e, step=state.step + 1
        )

    def step_nvt_nose_hoover(
        self, state: MDState, temperature: float, tau_fs: float = 25.0
    ) -> MDState:
        """One deterministic NVT step: Nose-Hoover chain around Velocity-
        Verlet (use `run_nvt_nose_hoover`, which installs the chain state).
        """
        dt = self.dt
        kt = KB_HARTREE * temperature
        dof = 3 * self._n_real
        m = state.nhc.shape[1]
        q = jnp.asarray(
            [dof * kt * tau_fs**2] + [kt * tau_fs**2] * (m - 1)
        )
        v, nhc = _nhc_update(
            state.velocities, state.nhc, self.masses, dof, kt, q, 0.5 * dt
        )
        inv_m = (ACCEL_UNIT / self.masses)[:, None]
        v_half = v + 0.5 * dt * state.forces * inv_m
        coords = state.coords + dt * v_half
        state = self._maybe_rebuild(state, coords)
        e, f = self._energy_and_forces(state, coords)
        v = v_half + 0.5 * dt * f * inv_m
        v, nhc = _nhc_update(v, nhc, self.masses, dof, kt, q, 0.5 * dt)
        return state.replace(
            coords=coords, velocities=v, forces=f, energy=e, nhc=nhc,
            step=state.step + 1,
        )

    def step_npt_berendsen(
        self,
        state: MDState,
        temperature: float,
        pressure_bar: float = 1.0,
        tau_t_fs: float = 100.0,
        tau_p_fs: float = 1000.0,
        kappa_per_bar: float = 4.6e-5,
    ) -> MDState:
        """One isothermal-isobaric (NPT) step: Berendsen weak coupling for
        both temperature and (isotropic) pressure around Velocity-Verlet.

        Use `run_npt_berendsen` (installs `state.scale`); construct the
        driver with `npt_compression` > 0 to give the neighbor table linear
        compression headroom.  `kappa_per_bar` is the isothermal
        compressibility (default: liquid water).  The instantaneous
        pressure comes from the pair virial, which shares the force
        backward pass (`_energy_forces_virial`).
        """
        dt = self.dt
        inv_m = (ACCEL_UNIT / self.masses)[:, None]
        v_half = state.velocities + 0.5 * dt * state.forces * inv_m
        coords = state.coords + dt * v_half
        state = self._maybe_rebuild(state, coords)
        e, f, du_ds = self._energy_forces_virial(state, coords, state.scale)
        v = v_half + 0.5 * dt * f * inv_m
        # Berendsen thermostat: weak-coupling velocity rescale
        ke = 0.5 * jnp.sum(self.masses[:, None] * v**2) / ACCEL_UNIT  # Ha
        t_inst = 2.0 * ke / (3 * self._n_real * KB_HARTREE)
        lam2 = 1.0 + (dt / tau_t_fs) * (
            temperature / jnp.maximum(t_inst, 1.0) - 1.0
        )
        v = v * jnp.sqrt(jnp.clip(lam2, 0.81, 1.21))
        # Berendsen barostat: isotropic cell/coordinate rescale toward the
        # target pressure.  P = (2K - G) / (3V) with the pair virial
        # G = sum_pairs r_ij . dU/dr_ij = scale * dU/dscale.
        volume = self._volume0 * state.scale**3
        p_bar = (
            (2.0 * ke - state.scale * du_ds) / (3.0 * volume)
        ) * PRESSURE_UNIT_BAR
        mu3 = 1.0 - (dt / tau_p_fs) * kappa_per_bar * (pressure_bar - p_bar)
        mu = jnp.clip(mu3, 0.97, 1.03) ** (1.0 / 3.0)
        return state.replace(
            coords=coords * mu,
            velocities=v,
            forces=f,
            energy=e,
            scale=state.scale * mu,
            step=state.step + 1,
        )

    # ---- drivers ----
    # Compiled scan programs are cached per (kind, length, params): a fresh
    # jax.jit wrapper per call would recompile the whole chunk every time.
    def _compiled_runner(self, key, make_step):
        cache = getattr(self, "_runner_cache", None)
        if cache is None:
            cache = {}
            self._runner_cache = cache
        if key not in cache:
            num_steps = key[1]

            @jax.jit
            def chunk(st):
                def body(st, _):
                    return make_step(st), None

                st, _ = jax.lax.scan(body, st, None, length=num_steps)
                return st

            cache[key] = chunk
        return cache[key]

    def run_nve(self, state: MDState, num_steps: int) -> MDState:
        """Run many NVE steps in one device program (lax.scan)."""
        runner = self._compiled_runner(("nve", num_steps), self.step_nve)
        return runner(state)

    def run_langevin(
        self,
        state: MDState,
        num_steps: int,
        temperature: float,
        friction_per_fs: float = 0.01,
    ) -> MDState:
        runner = self._compiled_runner(
            ("langevin", num_steps, float(temperature), float(friction_per_fs)),
            lambda st: self.step_langevin(st, temperature, friction_per_fs),
        )
        return runner(state)

    def run_nvt_nose_hoover(
        self,
        state: MDState,
        num_steps: int,
        temperature: float,
        tau_fs: float = 25.0,
        chain: int = 3,
    ) -> MDState:
        """Deterministic NVT via a Nose-Hoover chain thermostat."""
        if state.nhc is None:
            state = state.replace(nhc=jnp.zeros((2, chain)))
        runner = self._compiled_runner(
            ("nhc", num_steps, float(temperature), float(tau_fs), chain),
            lambda st: self.step_nvt_nose_hoover(st, temperature, tau_fs),
        )
        return runner(state)

    def run_npt_berendsen(
        self,
        state: MDState,
        num_steps: int,
        temperature: float,
        pressure_bar: float = 1.0,
        tau_t_fs: float = 100.0,
        tau_p_fs: float = 1000.0,
        kappa_per_bar: float = 4.6e-5,
    ) -> MDState:
        """Isotropic Berendsen NPT (periodic systems only).

        Construct the driver with ``npt_compression`` (e.g. 0.1) to give the
        neighbor table headroom for box shrinkage; once the box compresses
        past that margin the ``overflow`` flag trips (re-init the driver at
        the new density to continue).  The physical cell is
        ``state.scale * cell``.
        """
        if self.cell is None:
            raise ValueError("NPT requires a periodic cell")
        if state.scale is None:
            state = state.replace(scale=jnp.ones(()))
        runner = self._compiled_runner(
            (
                "npt",
                num_steps,
                float(temperature),
                float(pressure_bar),
                float(tau_t_fs),
                float(tau_p_fs),
                float(kappa_per_bar),
            ),
            lambda st: self.step_npt_berendsen(
                st, temperature, pressure_bar, tau_t_fs, tau_p_fs,
                kappa_per_bar,
            ),
        )
        return runner(state)

    def rebaseline(
        self, state: MDState
    ) -> tp.Tuple["MolecularDynamics", MDState]:
        """Fold an NPT state's drifted scale into a fresh driver.

        Returns a new driver whose init cell is ``scale * cell`` (so grids,
        capacities and the compression margin re-center on the current
        density, scale resetting to 1) and a state continuing the same
        trajectory (coords/velocities/thermostat state preserved, caches
        rebuilt, forces re-evaluated — identical physical system, so the
        energy is unchanged).  Call between NPT chunks when ``state.scale``
        nears the ``npt_compression`` margin (or on ``overflow``).
        """
        if state.scale is None:
            raise ValueError("rebaseline applies to NPT states (scale set)")
        if self.cell is None:
            raise ValueError("rebaseline requires a periodic cell")
        s = float(jax.device_get(state.scale))
        kw = dict(self._ctor)
        kw["cell"] = np.asarray(jax.device_get(self.cell)) * s
        md = MolecularDynamics(**kw)
        st = md.init(state.coords)
        return md, st.replace(
            velocities=state.velocities,
            key=state.key,
            step=state.step,
            nhc=state.nhc,
            scale=jnp.ones(()),
        )

    def _ensemble_step(self, state: MDState, ensemble: str, params: dict):
        """(prepared state, step fn, hashable cache-key suffix) for an
        ensemble name — shared by `trajectory` and the CLI."""
        p = dict(params)
        if ensemble == "nve":
            return state, self.step_nve, ()
        if ensemble == "langevin" or ensemble == "nvt":
            t = float(p.pop("temperature"))
            fr = float(p.pop("friction_per_fs", 0.01))
            step = lambda st: self.step_langevin(st, t, fr)  # noqa: E731
            key = (t, fr)
        elif ensemble == "nvt-nhc":
            t = float(p.pop("temperature"))
            tau = float(p.pop("tau_fs", 25.0))
            if state.nhc is None:
                state = state.replace(nhc=jnp.zeros((2, p.pop("chain", 3))))
            else:
                p.pop("chain", None)
            step = lambda st: self.step_nvt_nose_hoover(st, t, tau)  # noqa: E731
            key = (t, tau, state.nhc.shape[1])
        elif ensemble == "npt":
            if self.cell is None:
                raise ValueError("NPT requires a periodic cell")
            t = float(p.pop("temperature"))
            pb = float(p.pop("pressure_bar", 1.0))
            tt_ = float(p.pop("tau_t_fs", 100.0))
            tp_ = float(p.pop("tau_p_fs", 1000.0))
            k = float(p.pop("kappa_per_bar", 4.6e-5))
            if state.scale is None:
                state = state.replace(scale=jnp.ones(()))
            step = lambda st: self.step_npt_berendsen(  # noqa: E731
                st, t, pb, tt_, tp_, k
            )
            key = (t, pb, tt_, tp_, k)
        else:
            raise ValueError(f"unknown ensemble {ensemble!r}")
        if p:
            raise TypeError(f"unused {ensemble} parameters: {sorted(p)}")
        return state, step, key

    def trajectory(
        self,
        state: MDState,
        num_steps: int,
        record_every: int = 10,
        ensemble: str = "nve",
        **params,
    ) -> tp.Tuple[MDState, tp.Dict[str, Array]]:
        """Run ``num_steps`` recording a frame every ``record_every`` steps.

        One device program (nested `lax.scan`: frames are the outer scan's
        stacked outputs), so recording costs no extra host round-trips.
        Returns ``(final state, traj)`` with ``traj["coords"] (F, A, 3)``,
        ``"energies" (F,)``, ``"temperatures" (F,)`` and, for NPT,
        ``"scales" (F,)``.  The reference records trajectories through
        ASE dynamics attachments (reference ``ase.py``); here frames stay
        on-device until the run returns.
        """
        if num_steps % record_every:
            raise ValueError("num_steps must be a multiple of record_every")
        state, step, key_suffix = self._ensemble_step(state, ensemble, params)
        frames = num_steps // record_every
        key = ("traj", ensemble, frames, record_every) + key_suffix
        cache = getattr(self, "_runner_cache", None)
        if cache is None:
            cache = {}
            self._runner_cache = cache
        if key not in cache:
            n_real = self._n_real

            @jax.jit
            def chunk(st):
                def inner(st, _):
                    return step(st), None

                def outer(st, _):
                    st, _ = jax.lax.scan(
                        inner, st, None, length=record_every
                    )
                    ke = (
                        0.5
                        * jnp.sum(self.masses[:, None] * st.velocities**2)
                        / ACCEL_UNIT
                    )
                    temp = 2.0 * ke / (3 * n_real * KB_HARTREE)
                    frame = {
                        "coords": st.coords,
                        "energies": st.energy,
                        "temperatures": temp,
                    }
                    if st.scale is not None:
                        frame["scales"] = st.scale
                    return st, frame

                return jax.lax.scan(outer, st, None, length=frames)

            cache[key] = chunk
        return cache[key](state)


class MTSState(struct.PyTreeNode):
    """State of a multiple-timestep (RESPA) run: the fast driver's full MD
    state plus the slow lane's cache/forces (its ``coords``/``velocities``
    mirror the fast state at outer boundaries; ``forces``/``energy`` hold
    the SLOW component)."""

    fast: MDState
    slow: MDState

    # Combined views (valid at outer-step boundaries).
    @property
    def coords(self) -> Array:
        return self.fast.coords

    @property
    def velocities(self) -> Array:
        return self.fast.velocities

    @property
    def energy(self) -> Array:
        """Total potential energy (fast + slow lanes)."""
        return self.fast.energy + self.slow.energy

    @property
    def forces(self) -> Array:
        """Total forces (fast + slow lanes), user atom order."""
        return self.fast.forces + self.slow.forces

    @property
    def overflow(self) -> Array:
        return self.fast.overflow | self.slow.overflow

    @property
    def rebuilds(self) -> Array:
        return self.fast.rebuilds + self.slow.rebuilds

    @property
    def step(self) -> Array:
        return self.fast.step


class MultipleTimestepMD:
    """RESPA (r-RESPA impulse) multiple-timestep MD for models with a
    long-cutoff smooth tail (e.g. ANI-2dr's 8 A D3 dispersion over a 5.2 A
    NNP core).

    The reference delegates MD to ASE and evaluates the WHOLE model every
    step (reference ``ase.py``; D3 at ``potentials/dftd3.py:37-311`` rides
    the same 8 A neighborlist every femtosecond).  Dispersion energies are
    smooth and slowly varying, yet the 8 A cutoff forces the widest
    neighbor table of the whole model — measured 28 ms/step of a 47.9
    ms/step solvated-protein MD step (docs/performance.md).  The TPU
    design splits the Hamiltonian into two *independent* Verlet-cached
    lanes, each an ordinary `MolecularDynamics` driver running the
    time-honored impulse splitting:

    - **fast lane**: every potential reaching at most the NNP cutoff
      (NNP + repulsion + self energies), with its OWN cell grid and
      neighbor table at 5.2 A + skin — the per-step cost is exactly the
      dispersion-free configuration's.
    - **slow lane**: the long-cutoff potentials only, evaluated once per
      ``every`` inner steps as a velocity impulse of ``every * dt *
      F_slow`` (half applied before the inner segment, half after —
      symplectic, time-reversible).  Its wide table refreshes only at
      those boundaries, and its own skin criterion sees the accumulated
      displacement between evaluations.

    With ``every=1`` the scheme is algebraically identical to plain
    velocity Verlet on the full model (the half-kicks commute and sum).
    Stability: impulse RESPA resonates when ``every * dt`` approaches
    half the fastest period in the system (~10 fs X-H stretches), so keep
    ``every * dt`` at or below ~4 fs; validate with the NVE drift check
    (tests/test_md_mts.py does, and the bench's drift gate covers the
    production configuration).

    >>> mts = MultipleTimestepMD(model, species, cell=cell, pbc=True, every=4)
    >>> state = mts.init(coords, temperature=300.0)
    >>> state = mts.run(state, 1000)            # 1000 fs of NVE
    >>> e, f = state.energy, state.forces       # total (fast + slow)
    """

    def __init__(
        self,
        model,
        species: Array,  # (1, A) atomic numbers
        cell: tp.Optional[Array] = None,
        pbc: bool = False,
        every: int = 4,
        slow_names: tp.Optional[tp.Sequence[str]] = None,
        skin: float = 0.75,
        slow_skin: tp.Optional[float] = None,
        timestep_fs: float = 1.0,
        cache_slow_constants: bool = True,
        **md_kwargs,
    ) -> None:
        if every < 1:
            raise ValueError("every must be >= 1")
        self.every = int(every)
        self.dt = timestep_fs
        if slow_names is None:
            # default split: everything reaching beyond the NNP core is slow
            r_fast = float(model.potentials["nnp"].cutoff)
            slow_names = tuple(
                n
                for n, p in model.potentials.items()
                if p.enabled and float(p.cutoff) > r_fast
            )
        self.slow_names = tuple(slow_names)
        if not self.slow_names:
            raise ValueError(
                "MTS needs at least one enabled potential with a cutoff "
                "beyond the fast set (e.g. D3 dispersion over an NNP core)"
            )
        fast_model = model
        slow_model = model
        for n, p in model.potentials.items():
            if not p.enabled:
                continue
            if n in self.slow_names:
                fast_model = fast_model.set_enabled(n, False)
            else:
                slow_model = slow_model.set_enabled(n, False)
        if not any(p.enabled for p in fast_model.potentials.values()):
            raise ValueError("MTS fast set is empty; check slow_names")
        # self energies are coordinate-independent: keep them on the fast
        # lane only (state.energy sums the lanes)
        if slow_model.energy_shifter is not None:
            slow_model = slow_model.replace(
                energy_shifter=slow_model.energy_shifter.replace(enabled=False)
            )
        self.fast = MolecularDynamics(
            fast_model, species, cell=cell, pbc=pbc, skin=skin,
            timestep_fs=timestep_fs, **md_kwargs,
        )
        # cache_slow_constants: slow-lane potentials that declare
        # `frozen_window_channels` (D3: element-pair constants + neighbor
        # CN references) get those tables computed once per Verlet
        # REBUILD instead of re-gathered every impulse evaluation, and
        # run their restructured cached math (EXACT — the channels are
        # element-keyed constants; D3's coordination numbers stay live).
        # Profiled at ~17 of the 35 ms config-5 slow-lane eval.  A
        # window-FROZEN C6 variant was measured and rejected (non-finite
        # NVE — see dispersion.frozen_window_channels docstring).
        self.slow = MolecularDynamics(
            slow_model, species, cell=cell, pbc=pbc,
            skin=slow_skin if slow_skin is not None else skin,
            timestep_fs=timestep_fs,
            freeze_pair_window=(
                tuple(self.slow_names) if cache_slow_constants else ()
            ),
            **md_kwargs,
        )
        self._runner_cache: tp.Dict[tp.Tuple, tp.Any] = {}

    @property
    def masses(self) -> Array:
        return self.fast.masses

    def init(
        self,
        coords: Array,
        temperature: tp.Optional[float] = None,
        key: tp.Optional[Array] = None,
    ) -> MTSState:
        fast = self.fast.init(coords, temperature=temperature, key=key)
        slow = self.slow.init(coords)
        return MTSState(fast=fast, slow=slow)

    def _outer_step(self, s: MTSState, inner_step) -> MTSState:
        """One RESPA outer step: slow half-impulse, ``every`` inner steps
        of the fast lane, slow re-evaluation, slow half-impulse."""
        half = 0.5 * self.every * self.dt
        inv_m = (ACCEL_UNIT / self.fast.masses)[:, None]
        fast = s.fast.replace(
            velocities=s.fast.velocities + half * s.slow.forces * inv_m
        )

        def body(st, _):
            return inner_step(st), None

        fast, _ = jax.lax.scan(body, fast, None, length=self.every)
        slow = self.slow._maybe_rebuild(s.slow, fast.coords)
        es, fs = self.slow._energy_and_forces(slow, fast.coords)
        slow = slow.replace(coords=fast.coords, energy=es, forces=fs)
        fast = fast.replace(
            velocities=fast.velocities + half * fs * inv_m
        )
        return MTSState(fast=fast, slow=slow)

    def run(
        self,
        state: MTSState,
        num_steps: int,
        ensemble: str = "nve",
        **params,
    ) -> MTSState:
        """Run ``num_steps`` INNER (``timestep_fs``) steps in one device
        program.  ``num_steps`` must be a multiple of ``every``.  Ensembles:
        ``"nve"`` or ``"langevin"``/``"nvt"`` (the thermostat acts on the
        fast dynamics; slow impulses stay outside — standard Langevin
        RESPA).  NPT is not supported under MTS (the two lanes would need
        a shared barostat virial); use the plain driver for NPT.
        """
        if num_steps % self.every:
            raise ValueError("num_steps must be a multiple of `every`")
        if ensemble == "npt" or ensemble == "nvt-nhc":
            raise ValueError(f"ensemble {ensemble!r} not supported under MTS")
        fast_state, inner_step, key_suffix = self.fast._ensemble_step(
            state.fast, ensemble, params
        )
        state = MTSState(fast=fast_state, slow=state.slow)
        outer = num_steps // self.every
        key = (ensemble, outer, self.every) + key_suffix
        if key not in self._runner_cache:

            @jax.jit
            def chunk(st):
                def body(st, _):
                    return self._outer_step(st, inner_step), None

                st, _ = jax.lax.scan(body, st, None, length=outer)
                return st

            self._runner_cache[key] = chunk
        return self._runner_cache[key](state)


class CachedSinglePoint:
    """Repeated same-system energy+force evaluation at MD-step cost.

    One-shot `torchani_tpu.single_point` rebuilds the neighbor list from
    scratch every call (~80 ms at 10k atoms); workflows that evaluate many
    nearby geometries of ONE system — geometry optimization, ASE-style
    dynamics loops, active-learning rescoring — should instead reuse the MD
    driver's Verlet cache: each call recomputes only the differentiable
    refresh + model (the ~14 ms MD-step path), and the cached topology is
    rebuilt inside the jitted call only when the displacement criterion
    demands it (reference VerletCellList intent,
    ``/root/reference/torchani/neighbors.py:759-884``).

    >>> sp = CachedSinglePoint(model, species, cell=cell, pbc=True)
    >>> e0, f0 = sp(coords0)
    >>> e1, f1 = sp(coords1)   # same topology: no neighbor rebuild

    ``overflow`` reports whether ANY call's rebuild overflowed a static
    capacity (results are then unreliable, like the MD flag).
    """

    def __init__(
        self,
        model,
        species: Array,  # (1, A) atomic numbers
        cell: tp.Optional[Array] = None,
        pbc: bool = False,
        skin: float = 0.75,
        nn_precision: str = "highest",
        **md_kwargs,
    ) -> None:
        # strict f32 NN parity by default: single-point users compare
        # against reference energies, unlike MD where thermal noise
        # dominates the "high"-precision error
        self._md = MolecularDynamics(
            model, species, cell=cell, pbc=pbc, skin=skin,
            nn_precision=nn_precision, **md_kwargs,
        )
        self._state: tp.Optional[MDState] = None
        self._runner = None

    @property
    def overflow(self) -> bool:
        if self._state is None:
            return False
        return bool(jax.device_get(self._state.overflow))

    def reset(self) -> None:
        """Drop the cached topology (e.g. after changing the system)."""
        self._state = None

    def __call__(self, coords: Array) -> tp.Tuple[Array, Array]:
        """Energy (scalar) and forces (A, 3) at ``coords`` (user order)."""
        coords = jnp.asarray(coords)
        if coords.ndim == 3:
            coords = coords[0]
        if self._state is None:
            self._state = self._md.init(coords)
            return self._state.energy, self._state.forces
        if self._runner is None:

            def run(state: MDState, crd: Array):
                state = self._md._maybe_rebuild(state, crd)
                e, f = self._md._energy_and_forces(state, crd)
                return state.replace(coords=crd, energy=e, forces=f), e, f

            self._runner = jax.jit(run)
        self._state, e, f = self._runner(self._state, coords)
        return e, f
