"""Fused Pallas TPU kernel for the angular AEV.

The ``"pallas"`` strategy analog of the reference's cuAEV
(``/root/reference/torchani/csrc/aev.cu:332-472``): for each atom tile, the
whole angular pipeline — neighbor-pair grid, cos(theta) via the
angle-difference identity, radial x angular feature products, and the
two-sided species accumulation — runs in VMEM without materializing the
``(A, Ka, Ka, Z)`` terms tensor in HBM.

Forward only; the backward pass uses an XLA recomputation (wired via
``jax.custom_vjp`` in `computer.py`), which keeps grad-of-grad (force
training) automatically correct.
"""

import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["angular_aev_pallas"]


def _angular_kernel(
    shifts_ref,  # (1, Sh) SMEM
    cossec_ref,  # (1, Se) SMEM
    sinsec_ref,  # (1, Se) SMEM
    dist_ref,  # (TA, Ka) f32 — 1.0 in masked lanes
    dx_ref,  # (TA, Ka)
    dy_ref,
    dz_ref,
    oh_ref,  # (TA, S, Ka) f32 one-hot by species plane (0 in masked lanes)
    out_ref,  # (TA, Z * 128) f32 — each z gets a 128-lane slot (P used)
    *,
    eta: float,
    zeta: float,
    num_shifts: int,
    num_sections: int,
    cutoff: float,
    cutoff_kind: str,
    num_species: int,
    pair_rows: tp.Tuple[int, ...],
    pair_cols: tp.Tuple[int, ...],
):
    ta, ka = dist_ref.shape
    s = num_species
    d = dist_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    # per-species 2D planes (Mosaic prefers 2D ops; 3D gathers don't lower)
    oh_p = [oh_ref[:, t, :] for t in range(s)]  # each (TA, Ka)
    # mask = any species set (masked lanes have all-zero one-hot)
    m = oh_p[0]
    for t in range(1, s):
        m = m + oh_p[t]
    m = jnp.minimum(m, 1.0)  # (TA, Ka)

    if cutoff_kind == "cosine":
        fc = (0.5 * jnp.cos(d * (math.pi / cutoff)) + 0.5) * m
    else:  # smooth, order 2, eps 1e-10
        e = 1.0 - 1.0 / jnp.maximum(1.0 - (d / cutoff) ** 2, 1e-10)
        fc = jnp.exp(e) * m

    inv_d = 1.0 / d

    def outer(a, b):
        return a[:, :, None] * b[:, None, :]

    dots = outer(dx, dx) + outer(dy, dy) + outer(dz, dz)
    c = (0.95 * dots) * outer(inv_d, inv_d)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-20))
    mean_d = 0.5 * (d[:, :, None] + d[:, None, :])
    jj = jax.lax.broadcasted_iota(jnp.int32, (ka, ka), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (ka, ka), 1)
    notself = jnp.where(jj == kk, 0.0, 1.0)[None]
    fc2 = outer(fc, fc) * notself  # (TA, Kj, Kk), pair validity folded in

    scale = 2.0 * 2.0 ** (-zeta)  # fold the 2 * (1/2)^zeta prefactor
    p = len(pair_rows)

    # feature loop as fori_loop (an unrolled 32x body chokes the Mosaic
    # compiler); per-z scalars come from SMEM
    def zbody(z, carry):
        sh_i = z // num_sections
        se_i = z % num_sections
        rs = shifts_ref[0, sh_i]
        rad = jnp.exp(-eta * (mean_d - rs) ** 2) * fc2
        cos_dev = c * cossec_ref[0, se_i] + sin_theta * sinsec_ref[0, se_i]
        t_z = rad * (scale * (1.0 + cos_dev) ** zeta)  # (TA, Kj, Kk)
        # w[t] = sum_k T * oh_t[k]  (TA, Kj)
        w = [jnp.sum(t_z * oh_p[t][:, None, :], axis=2) for t in range(s)]
        # T is symmetric in (j, k) and the grid covers both orders, so
        # V~[s, t] = sum_{j != k} T oh_j[s] oh_k[t] is symmetric:
        # off-diagonal packed pairs equal V~[s1, s2] directly and the
        # diagonal needs the 0.5 double-count correction.
        rows = []
        for p_i in range(p):
            s1, s2 = pair_rows[p_i], pair_cols[p_i]
            if s1 == s2:
                rows.append(0.5 * jnp.sum(w[s1] * oh_p[s1], axis=1))
            else:
                rows.append(jnp.sum(w[s2] * oh_p[s1], axis=1))
        # z-major write into a 128-lane-aligned slot (Mosaic requires
        # dynamic lane offsets to be 128-multiples); caller strips the pad
        block = jnp.stack(rows, axis=1)  # (TA, P)
        block = jnp.concatenate(
            [block, jnp.zeros((ta, 128 - p), jnp.float32)], axis=1
        )
        out_ref[:, pl.ds(pl.multiple_of(z * 128, 128), 128)] = block
        return carry

    jax.lax.fori_loop(0, num_shifts * num_sections, zbody, 0)


def angular_aev_pallas(
    dist: jax.Array,  # (N, Ka), masked lanes hold 1.0
    diff: jax.Array,  # (N, Ka, 3), masked lanes 0
    mask: jax.Array,  # (N, Ka) bool
    oh: jax.Array,  # (N, Ka, S) one-hot with masked lanes all-zero
    *,
    eta: float,
    zeta: float,
    shifts: tp.Sequence[float],
    sections: tp.Sequence[float],
    cutoff: float,
    cutoff_kind: str,
    num_species: int,
    tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused angular AEV; returns ``(N, P * Z)`` (pair-major layout)."""
    n, ka = dist.shape
    s = num_species
    num_z = len(shifts) * len(sections)
    iu1, iu2 = np.triu_indices(s)
    p = len(iu1)

    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def pad0(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    dist_p = pad0(jnp.where(mask, dist, 1.0), 1.0)
    dx = pad0(jnp.where(mask, diff[..., 0], 0.0))
    dy = pad0(jnp.where(mask, diff[..., 1], 0.0))
    dz = pad0(jnp.where(mask, diff[..., 2], 0.0))
    oh_planes = pad0(
        jnp.swapaxes(jnp.where(mask[..., None], oh, 0.0), 1, 2)
    )  # (N, S, Ka)

    kernel = functools.partial(
        _angular_kernel,
        eta=float(eta),
        zeta=float(zeta),
        num_shifts=len(shifts),
        num_sections=len(sections),
        cutoff=float(cutoff),
        cutoff_kind=cutoff_kind,
        num_species=s,
        pair_rows=tuple(int(x) for x in iu1),
        pair_cols=tuple(int(x) for x in iu2),
    )
    shifts_arr = jnp.asarray(
        np.asarray(shifts, dtype=np.float32).reshape(1, -1)
    )
    cossec_arr = jnp.asarray(
        np.cos(np.asarray(sections, dtype=np.float64)).astype(np.float32).reshape(1, -1)
    )
    sinsec_arr = jnp.asarray(
        np.sin(np.asarray(sections, dtype=np.float64)).astype(np.float32).reshape(1, -1)
    )
    grid = (n_pad // tile,)
    vec = lambda: pl.BlockSpec(  # noqa: E731
        (tile, ka), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda w: pl.BlockSpec(  # noqa: E731
        (1, w), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem(len(shifts)),
            smem(len(sections)),
            smem(len(sections)),
            vec(),
            vec(),
            vec(),
            vec(),
            pl.BlockSpec((tile, s, ka), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, num_z * 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, num_z * 128), jnp.float32),
        interpret=interpret,
    )(shifts_arr, cossec_arr, sinsec_arr, dist_p, dx, dy, dz, oh_planes)
    # kernel emits z-major 128-lane slots; strip padding and permute to the
    # reference's pair-major (P, Z) layout
    out = out[:n].reshape(n, num_z, 128)[:, :, :p]
    return jnp.swapaxes(out, 1, 2).reshape(n, p * num_z)
