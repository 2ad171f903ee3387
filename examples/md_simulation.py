"""Native MD: jitted NVE/Langevin dynamics with Verlet-skin neighbor caching.

No reference analog — the reference delegates MD to ASE (Python-loop, one
graph launch per step). Here the integrator, the cutoff-skin rebuild decision
(``lax.cond``) and the force evaluation compile into ONE program, and
``lax.scan`` runs whole trajectory chunks per device launch. This is the
engine behind the headline 10k-atom benchmark (bench.py).

    python examples/md_simulation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, kinetic_temperature
    from torchani_tpu.testing import make_water_box

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1,
                          key=jax.random.PRNGKey(0))

    # A periodic water box.
    species, coords, cell = make_water_box(80)
    sp = jnp.asarray(species)
    print(f"{int((sp >= 0).sum())} atoms, cell {float(cell[0, 0]):.1f} A")

    md = MolecularDynamics(
        model,
        sp,
        cell=jnp.asarray(cell),
        pbc=True,
        skin=0.75,             # Verlet skin: rebuild only when atoms drift
        timestep_fs=0.5,
    )
    state = md.init(jnp.asarray(coords), temperature=300.0,
                    key=jax.random.PRNGKey(1))

    # Langevin NVT: 5 chunks of 100 steps; each chunk is ONE device launch
    # (the compiled runner is cached per chunk length).
    for chunk in range(5):
        state = md.run_langevin(state, num_steps=100, temperature=300.0,
                                friction_per_fs=0.02)
        t = float(kinetic_temperature(state.velocities, md.masses))
        print(f"step {int(state.step):4d}: E_pot {float(state.energy):.3f} Ha"
              f"  T {t:6.1f} K  rebuilds {int(state.rebuilds)}")

    # NVE run from the thermalized state.
    e0 = float(state.energy)
    state = md.run_nve(state, num_steps=200)
    print(f"NVE 200 steps: dE_pot {float(state.energy) - e0:+.5f} Ha, "
          f"neighbor overflow={bool(state.overflow)}")

    # Deterministic NVT (Nose-Hoover chain), recording a trajectory frame
    # every 10 steps ON DEVICE (no per-frame host round trips).
    state, traj = md.trajectory(state, num_steps=50, record_every=10,
                                ensemble="nvt-nhc", temperature=300.0,
                                tau_fs=25.0)
    t = float(traj["temperatures"][-1])
    print(f"NHC NVT: {traj['coords'].shape[0]} frames, T {t:6.1f} K")

    # Constant pressure (isotropic Berendsen NPT): construct the driver
    # with `npt_compression` so the neighbor table has headroom for box
    # shrinkage; the physical cell is state.scale * cell.
    md_npt = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True,
                               timestep_fs=0.5, npt_compression=0.1)
    st = md_npt.init(jnp.asarray(coords), temperature=300.0,
                     key=jax.random.PRNGKey(2))
    st = md_npt.run_npt_berendsen(st, num_steps=50, temperature=300.0,
                                  pressure_bar=1.0)
    print(f"NPT 50 steps: V/V0 {float(st.scale) ** 3:.4f}, "
          f"overflow={bool(st.overflow)}")


if __name__ == "__main__":
    main()
