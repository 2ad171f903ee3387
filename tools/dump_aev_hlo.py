"""Dump optimized HLO for the AEV fwd+bwd programs (see profile_aev.py).

    python tools/dump_aev_hlo.py [tbl|full]   # writes /tmp/aev_<mode>_hlo.txt
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True)
    model = md.model
    state = md.init(jnp.asarray(coords))
    elem = md.elem_idxs
    c0 = state.coords
    aevc = model.potentials["nnp"].aev_computer

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    nb0 = jax.jit(refresh_and_narrow)(c0)

    def aev_tbl(diff):
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        nb = nb0.replace(
            dist=jnp.where(nb0.mask, d, 1.0),
            diff=jnp.where(nb0.mask[..., None], diff, 0.0),
        )
        return aevc.compute_from_neighbors(elem, c0[None], batched(nb))

    mode = sys.argv[1] if len(sys.argv) > 1 else "tbl"
    if mode == "build":
        def build_fn(c):
            idx, mask, shift, nbr_elem, rev, overflow, tables, _aux = md._build_cache(c)
            tot = shift.sum() + (idx + nbr_elem + rev).sum() + mask.sum()
            if tables is not None:
                tot = tot + sum(
                    jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree.leaves(tables)
                )
            return tot

        reps = 10
        scanned = jax.jit(
            lambda x0: jax.lax.fori_loop(
                0, reps, lambda i, acc: acc + build_fn(x0 + i * 1e-7), 0.0
            )
        )
        text = scanned.lower(c0).compile().as_text()
        out = Path("/tmp/aev_build_hlo.txt")
        out.write_text(text)
        print("wrote", out, len(text), "chars")
        return
    if mode == "full":
        def aev_full(c):
            return aevc.compute_from_neighbors(
                elem, c[None], batched(refresh_and_narrow(c))
            )

        fn = jax.grad(lambda c: jnp.sum(aev_full(c) ** 2))
        x = c0
    elif mode == "ef":
        # match tools/profile_aev.py mode "ef" (fusion numbers line up)
        fn = lambda c: sum(  # noqa: E731
            jnp.sum(o) for o in md._energy_and_forces(state, c)
        )
        x = c0
    else:
        fn = jax.grad(lambda d: jnp.sum(aev_tbl(d) ** 2))
        x = nb0.diff
    reps = 30
    scanned = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, acc: acc + jnp.sum(fn(x0 + i * 1e-7)), 0.0
        )
    )
    text = scanned.lower(x).compile().as_text()
    out = Path(f"/tmp/aev_{mode}_hlo.txt")
    out.write_text(text)
    print("wrote", out, len(text), "chars")


if __name__ == "__main__":
    main()
