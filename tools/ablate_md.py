"""Ablation timing of the 10k-atom MD force path on TPU.

Mirrors the MD inner step (cached Verlet topology -> refresh diffs ->
narrow -> AEV -> NN) and times each stage separately.

    python tools/ablate_md.py [n_molecules]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, x, reps=250):
    """Time fn by scanning it `reps` times inside ONE jitted program.

    A per-call scalar fetch costs a full tunnel round-trip (~30 ms) in this
    environment, so per-call timing swamps sub-50ms kernels.  The iteration
    index perturbs the input to defeat CSE across iterations.

    reps matters: the ONE fetch's ~30 ms RTT amortizes as RTT/reps over
    the measured unit — at reps=50 that's a +0.6 ms floor ON EVERY STAGE
    (discovered r5, tools/loop_overhead_probe.py: an EMPTY loop measures
    0.62 ms/iter at reps=50, 0.12 at reps=200).  Every r1-r4 sub-5 ms
    stage number carries that inflation; reps=250 keeps it at ~0.12 ms.
    """

    def body(i, acc):
        return acc + jnp.sum(fn(x + i * 1e-7))

    scanned = jax.jit(lambda x0: jax.lax.fori_loop(0, reps, body, 0.0))
    for attempt in range(4):  # the tunnel compile service drops bodies sometimes
        try:
            _ = float(scanned(x))  # compile + warm
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10002
    species, coords, cell = make_water_box(n_atoms)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    import os
    bucket = os.environ.get("TT_BUCKET", "auto")
    bucket = {"auto": "auto", "1": True, "0": False}[bucket]
    md = MolecularDynamics(
        model, sp, cell=jnp.asarray(cell), pbc=True, bucket_refresh=bucket
    )
    state = md.init(jnp.asarray(coords))
    # AFTER init: includes the sorted-lane angular preslice AND the
    # measured count-class angular split (init-time auto-tunes)
    model = md.model
    print(f"bucket_refresh c={md._bucket_c}", flush=True)
    elem = md.elem_idxs
    c0 = state.coords
    print(f"atoms={c0.shape[0]} K={state.nbr_idx.shape[1]}", flush=True)

    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    networks = nnp.neural_networks

    def refresh_and_narrow(c):
        nb = _refresh_neighbors(state, c)
        return narrow_to_cutoff(nb, md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    # 0) neighbor refresh + narrow only
    print(f"refresh+narrow   {timeit(lambda c: refresh_and_narrow(c).dist, c0):8.2f} ms", flush=True)

    # 0b) + angular repack (the top_k packing inside the AEV computer)
    from torchani_tpu.neighbors import repack_to_capacity

    def repack_fn(c):
        nb = refresh_and_narrow(c)
        lslice = aevc.angular_preslice
        if lslice is not None and lslice < nb.idx.shape[-1]:
            nb = jax.tree.map(
                lambda x: x[..., :lslice] if getattr(x, "ndim", 0) == 2
                else (x[..., :lslice, :] if getattr(x, "ndim", 0) == 3 else x),
                nb,
            )
        ang = narrow_to_cutoff(nb, aevc.angular.cutoff)
        cap = aevc._angular_capacity(state.nbr_idx.shape[-1], c.shape[0])
        return repack_to_capacity(ang, cap).dist

    print(f"refresh+repack   {timeit(repack_fn, c0):8.2f} ms", flush=True)
    print(f"refresh f+b      {timeit(jax.grad(lambda c: jnp.sum(refresh_and_narrow(c).dist ** 2)), c0):8.2f} ms", flush=True)
    print(f"refresh+rep f+b  {timeit(jax.grad(lambda c: jnp.sum(repack_fn(c) ** 2)), c0):8.2f} ms", flush=True)

    # 0c) AEV with a 1-feature angular term: isolates the radial + one-hot +
    # repack + plumbing cost from the real angular math
    from torchani_tpu.aev.terms import ANIAngular

    cheap = aevc.replace(
        angular=ANIAngular.make(12.5, 14.1, [0.8], [0.2], 3.5, "cosine")
    )

    def aev_cheap_fn(c):
        return cheap.compute_from_neighbors(elem, c[None], batched(refresh_and_narrow(c)))

    print(f"aev_cheapang f   {timeit(aev_cheap_fn, c0):8.2f} ms", flush=True)
    print(f"aev_cheapang f+b {timeit(jax.grad(lambda c: jnp.sum(aev_cheap_fn(c) ** 2)), c0):8.2f} ms", flush=True)

    # 0d) AEV from a FIXED table, grad wrt the diff vectors (dist recomputed
    # from diff exactly as refresh does).  Removes the coord gather/scatter
    # refresh AD from the picture: isolates the AEV-internal backward.
    nb0 = jax.jit(refresh_and_narrow)(c0)

    def tbl_fn(computer):
        def fn(diff):
            d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
            nb = nb0.replace(
                dist=jnp.where(nb0.mask, d, 1.0),
                diff=jnp.where(nb0.mask[..., None], diff, 0.0),
            )
            return computer.compute_from_neighbors(elem, c0[None], batched(nb))

        return fn

    aev_tbl = tbl_fn(aevc)
    cheap_tbl = tbl_fn(cheap)
    print(f"aev_tbl f        {timeit(aev_tbl, nb0.diff):8.2f} ms", flush=True)
    print(f"aev_tbl f+b      {timeit(jax.grad(lambda d: jnp.sum(aev_tbl(d) ** 2)), nb0.diff):8.2f} ms", flush=True)
    print(f"aev_tbl_chp f+b  {timeit(jax.grad(lambda d: jnp.sum(cheap_tbl(d) ** 2)), nb0.diff):8.2f} ms", flush=True)

    # 1) AEV forward (incl. refresh)
    def aev_fn(c):
        return aevc.compute_from_neighbors(elem, c[None], batched(refresh_and_narrow(c)))

    print(f"aev_fwd          {timeit(aev_fn, c0):8.2f} ms", flush=True)
    print(f"aev_fwd+bwd      {timeit(jax.grad(lambda c: jnp.sum(aev_fn(c) ** 2)), c0):8.2f} ms", flush=True)

    # 2) NN on fixed AEVs
    aevs = jax.jit(aev_fn)(c0)

    def nn_fn(a):
        return jnp.sum(networks(elem, a))

    print(f"nn_fwd           {timeit(nn_fn, aevs):8.2f} ms", flush=True)
    print(f"nn_fwd+bwd       {timeit(jax.grad(nn_fn), aevs):8.2f} ms", flush=True)

    # 3) full cached-topology force eval (what one MD step pays for forces)
    def full_fn(c):
        nb = batched(refresh_and_narrow(c))
        return jnp.sum(model.compute_from_neighbors(elem, c[None], nb).energies)

    print(f"full e+f cached  {timeit(jax.grad(full_fn), c0):8.2f} ms", flush=True)

    # 4) Verlet cache rebuild (cell list + lane sort + partner map); amortized
    # over the rebuild interval in MD (bench reports rebuilds_in_window)
    def build_fn(c):
        idx, mask, shift, nbr_elem, rev, overflow, _tables, _aux = md._build_cache(c)
        tot = shift.sum() + (idx + nbr_elem + rev).sum() + mask.sum()
        if _tables is not None:
            tot = tot + sum(
                jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(_tables)
            )
        return tot

    print(f"cache rebuild    {timeit(build_fn, c0, reps=100):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
