"""Trajectory observables: RDF, MSD, velocity autocorrelation.

Companions to ``MolecularDynamics.trajectory`` frames.  The reference has
no analysis layer of its own (it delegates MD to ASE); these cover the
common observables users would otherwise reach to ASE/MDAnalysis for,
as jit-friendly array programs (static shapes, scan over frames).
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.annotations import Array
from torchani_tpu.utils import exact_matmul

__all__ = [
    "radial_distribution",
    "mean_squared_displacement",
    "velocity_autocorrelation",
    "diffusion_coefficient",
]


def _min_image_dist2(coords: Array, cell: tp.Optional[Array]) -> Array:
    """All-pairs squared distances (A, A) under minimum image (orthorhombic
    and general cells: nearest of the 27 adjacent images)."""
    diff = coords[None, :, :] - coords[:, None, :]  # (A, A, 3)
    if cell is None:
        return jnp.sum(diff * diff, axis=-1)
    # fractional wrap to [-0.5, 0.5) then the nearest of 27 images (exact
    # for cells whose skew keeps the Wigner-Seitz cell inside +-1 images —
    # true for every MD cell this library builds)
    inv = jnp.linalg.inv(cell)
    frac = exact_matmul(diff, inv)
    frac = frac - jnp.round(frac)
    base = exact_matmul(frac, cell)
    shifts = jnp.asarray(
        [
            [i, j, k]
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
            for k in (-1, 0, 1)
        ],
        base.dtype,
    )
    shifts = exact_matmul(shifts, cell)  # (27, 3)
    cand = base[:, :, None, :] + shifts[None, None]  # (A, A, 27, 3)
    return jnp.min(jnp.sum(cand * cand, axis=-1), axis=-1)


def radial_distribution(
    frames: Array,  # (F, A, 3) coordinates
    cell: tp.Optional[Array],
    r_max: float,
    num_bins: int = 100,
    species: tp.Optional[Array] = None,  # (A,) atomic numbers / elem idxs
    pair: tp.Optional[tp.Tuple[int, int]] = None,  # restrict to (za, zb)
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """g(r) averaged over frames.  Returns (bin centers, g) as numpy.

    ``pair=(za, zb)`` restricts centers to species ``za`` and partners to
    ``zb`` (e.g. O-O in water).  Normalization uses the ideal-gas shell
    count at the partner density in the (fixed) cell volume; without a
    cell, the density of the bounding sphere of the first frame is used.
    """
    frames = jnp.asarray(frames)
    f, a, _ = frames.shape
    if species is not None and pair is not None:
        sp = jnp.asarray(species)
        row = sp == pair[0]
        col = sp == pair[1]
        mask = row[:, None] & col[None, :]
        n_center = float(jnp.sum(row))
        n_partner = float(jnp.sum(col))
    else:
        mask = jnp.ones((a, a), bool)
        n_center = float(a)
        n_partner = float(a)
    mask = mask & ~jnp.eye(a, dtype=bool)
    edges = jnp.linspace(0.0, r_max, num_bins + 1)

    def one_frame(carry, coords):
        d2 = _min_image_dist2(coords, None if cell is None else jnp.asarray(cell))
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        d = jnp.where(mask, d, 2.0 * r_max)  # out-of-range sentinel
        idx = jnp.clip(
            (d / r_max * num_bins).astype(jnp.int32), 0, num_bins
        )
        hist = jnp.zeros((num_bins + 1,)).at[idx.reshape(-1)].add(1.0)
        return carry + hist[:num_bins], None

    hist, _ = jax.lax.scan(one_frame, jnp.zeros((num_bins,)), frames)
    hist = np.asarray(hist) / f
    if cell is not None:
        volume = float(abs(np.linalg.det(np.asarray(cell))))
    else:
        c0 = np.asarray(frames[0])
        r = np.linalg.norm(c0 - c0.mean(0), axis=-1).max() + 1e-6
        volume = 4.0 / 3.0 * np.pi * r**3
    centers = np.asarray((edges[:-1] + edges[1:]) / 2.0)
    shell = 4.0 * np.pi * centers**2 * (r_max / num_bins)
    ideal = shell * (n_partner / volume) * n_center
    return centers, hist / np.maximum(ideal, 1e-12)


def mean_squared_displacement(frames: Array) -> np.ndarray:
    """MSD(t) vs the first frame, (F,) in Angstrom^2 (no unwrapping —
    feed unwrapped MD coordinates, which this library's integrators keep)."""
    frames = jnp.asarray(frames)
    d = frames - frames[0][None]
    return np.asarray(jnp.mean(jnp.sum(d * d, axis=-1), axis=-1))


def diffusion_coefficient(
    frames: Array, frame_interval_fs: float, fit_from: float = 0.5
) -> float:
    """Einstein diffusion coefficient D = slope(MSD)/6 in Angstrom^2/fs.

    Least-squares slope over the tail of the MSD curve (``fit_from``
    fraction onward, skipping the ballistic/cage regime).  Multiply by
    1e-1 for cm^2/s.
    """
    msd = mean_squared_displacement(frames)
    f = msd.shape[0]
    start = min(f - 2, max(1, int(f * fit_from)))
    t = np.arange(start, f) * frame_interval_fs
    y = msd[start:]
    slope = np.polyfit(t, y, 1)[0]
    return float(slope / 6.0)


def velocity_autocorrelation(velocities: Array) -> np.ndarray:
    """Normalized VACF(t) = <v(0).v(t)> / <v(0).v(0)> over atoms, (F,)."""
    v = jnp.asarray(velocities)
    num = jnp.mean(jnp.sum(v[0][None] * v, axis=-1), axis=-1)
    return np.asarray(num / jnp.maximum(num[0], 1e-30))
