"""Microbenchmark: atom-packed vs slot-row bucket-dot refresh (TPU).

Two phases (tables are built from a REAL 10k-atom water-box cell list so
the packing ratio is the production one, but the build runs on CPU --
building on the TPU would add minutes of compile for a one-off):

    python tools/packed_microbench.py prep    # CPU: build + save tables
    python tools/packed_microbench.py         # TPU: verify + time

Times four things at water-box shapes (A=10002, C=64, K=120):
  - slot-row kernels, full `bucket_nbr_pos` fwd and fwd+vjp
  - atom-packed kernels, full `packed_nbr_pos` fwd and fwd+vjp
and checks on-chip bit-equality of the two forwards on masked lanes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NPZ = "/tmp/packed_bench_tables.npz"

BUCKET_FIELDS = ("keys", "atom_of_slot", "slot_of_atom", "wrap_offset", "wrapshift")
PACKED_FIELDS = (
    "keys_flat",
    "tile_bucket",
    "atom_of_row",
    "row_of_atom",
    "atom_of_slot",
    "slot_of_atom",
    "wrap_offset",
    "wrapshift",
)


def prep():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from torchani_tpu.bucket_refresh import make_wrapshift, tables_from_cell_aux
    from torchani_tpu.bucket_refresh_packed import choose_span, pack_tables
    from torchani_tpu.neighbors import _static_grid_shape, cell_list
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    a = species.shape[1]
    coords = jnp.asarray(coords[0])
    cell = jnp.asarray(cell)
    elem = jnp.zeros((1, a), jnp.int32)  # species don't matter for positions
    cutoff = 5.1 + 0.75  # production build radius (cutoff + skin)
    grid = _static_grid_shape(np.asarray(cell), cutoff)
    c, k = 64, 120
    nbrs, aux = jax.jit(
        lambda crd: cell_list(
            cutoff, elem, crd[None], cell, jnp.asarray([True] * 3),
            capacity=k, bucket_capacity=c, bucket_aux=True,
        )
    )(coords)
    assert not bool(nbrs.overflow), "capacity overflow in prep"
    mask = nbrs.idx[0], nbrs.mask[0]
    idx, mask = nbrs.idx[0], nbrs.mask[0]
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables = tables_from_cell_aux(
        aux["keys"], mask, aux["atom_of_slot"], aux["slot_of_atom"],
        coords - aux["central"], ws, c,
    )
    g = int(np.prod(grid))
    counts = np.asarray(jnp.sum((tables.atom_of_slot < a).reshape(g, c), axis=1))
    sb, s_cap = choose_span(grid, counts, c, kl=-(-k // 128) * 128)
    packed, povf = jax.jit(lambda t: pack_tables(t, sb, s_cap))(tables)
    assert not bool(povf), "span overflow in prep"
    ns = g // sb
    print(
        f"A={a} G={g} C={c} K={k} grid={grid} sb={sb} s_cap={s_cap} "
        f"slot rows={g*c} packed rows={ns*s_cap} "
        f"(ratio {g*c/(ns*s_cap):.2f}x)"
    )
    out = {"coords": np.asarray(coords), "mask": np.asarray(mask)}
    for f in BUCKET_FIELDS:
        out["b_" + f] = np.asarray(getattr(tables, f))
    for f in PACKED_FIELDS:
        out["p_" + f] = np.asarray(getattr(packed, f))
    np.savez(NPZ, **out)
    print(f"saved {NPZ}")


def bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchani_tpu.bucket_refresh import BucketTables, bucket_nbr_pos
    from torchani_tpu.bucket_refresh_packed import PackedTables, packed_nbr_pos

    data = np.load(NPZ)
    tables = BucketTables(**{f: jnp.asarray(data["b_" + f]) for f in BUCKET_FIELDS})
    packed = PackedTables(**{f: jnp.asarray(data["p_" + f]) for f in PACKED_FIELDS})
    coords = jnp.asarray(data["coords"])
    mask = jnp.asarray(data["mask"])
    a, k = mask.shape
    canon = coords - tables.wrap_offset
    print(f"backend={jax.default_backend()}", flush=True)

    def slot_fwd(crd):
        return bucket_nbr_pos(
            crd, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
            tables.wrapshift,
        )

    def packed_fwd(crd):
        return packed_nbr_pos(crd, packed)[:, :k]

    m = mask[..., None]
    w = jnp.asarray(np.random.RandomState(7).randn(a, k, 3).astype(np.float32))

    def timeit(fn, x, reps=50):
        def body(i, acc):
            return acc + jnp.sum(fn(x + i * jnp.asarray(1e-7, x.dtype)))

        scanned = jax.jit(lambda y: jax.lax.fori_loop(0, reps, body, 0.0))
        _ = float(scanned(x))
        t0 = time.perf_counter()
        _ = float(scanned(x))
        return (time.perf_counter() - t0) / reps * 1e3

    # compile + run each piece separately with progress prints: the critical
    # unknown is whether Mosaic lowers the packed kernels at all
    t0 = time.perf_counter()
    out_p = jax.jit(packed_fwd)(canon)
    s = float(jnp.sum(jnp.where(m, out_p, 0.0)))
    print(
        f"packed fwd compiled+ran in {time.perf_counter()-t0:.0f}s "
        f"(checksum {s:.6g})",
        flush=True,
    )

    def packed_loss(crd):
        return jnp.sum(w * jnp.where(m, packed_fwd(crd), 0.0))

    t0 = time.perf_counter()
    g_p = jax.jit(jax.grad(packed_loss))(canon)
    print(
        f"packed bwd compiled+ran in {time.perf_counter()-t0:.0f}s "
        f"(checksum {float(jnp.sum(g_p)):.6g})",
        flush=True,
    )

    t0 = time.perf_counter()
    out_s = jax.jit(lambda crd: jnp.where(m, slot_fwd(crd), 0.0))(canon)
    print(f"slot fwd compiled+ran in {time.perf_counter()-t0:.0f}s", flush=True)
    err = float(
        jax.jit(lambda x, y: jnp.max(jnp.abs(x - y)))(
            jnp.where(m, out_p, 0.0), out_s
        )
    )
    print(f"packed vs slot masked max|diff| = {err:.3g}", flush=True)

    def slot_loss(crd):
        return jnp.sum(w * jnp.where(m, slot_fwd(crd), 0.0))

    for name, fn, loss in (
        ("slot", slot_fwd, slot_loss),
        ("packed", packed_fwd, packed_loss),
    ):
        t_f = timeit(fn, canon)
        t_g = timeit(jax.grad(loss), canon)
        print(f"{name:7s} fwd {t_f:6.2f} ms   fwd+vjp {t_g:6.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "prep":
        prep()
    else:
        bench()
