"""Replica-exchange (parallel tempering) MD on a temperature ladder.

The whole ladder is one (replicas, atoms) batch: every Langevin step is a
single SIMD program and the Metropolis swap moves run device-side, so an
entire parallel-tempering run is one jitted lax.scan. (The reference has no
native MD; it delegates single-system dynamics to ASE.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import torchani_tpu as tt
from torchani_tpu.replica import ReplicaExchange


def main():
    model = tt.simple_ani(
        ("H", "C", "N", "O"), ensemble_size=1, key=jax.random.PRNGKey(0)
    )

    # a strained butane-ish chain: parallel tempering helps it hop barriers
    species = np.array([6, 6, 6, 6, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1])
    rng = np.random.RandomState(0)
    coords = np.array(
        [[0.0, 0.0, 0.0], [1.54, 0.0, 0.0], [2.05, 1.45, 0.0],
         [3.59, 1.45, 0.0]]
        + [[0.5 + 0.8 * i, -0.9 * (-1) ** i, 0.9] for i in range(10)],
        np.float32,
    ) + rng.rand(14, 3).astype(np.float32) * 0.05

    ladder = (300.0, 400.0, 550.0, 750.0)
    rex = ReplicaExchange(model, species, temperatures=ladder, timestep_fs=0.5)
    state = rex.init(coords, seed=42)

    for block in range(3):
        state = rex.run(state, segments=10, steps_per_segment=20)
        print(
            f"block {block}: {int(state.step)} steps/replica, "
            f"E = {np.asarray(state.energy).round(4)}, "
            f"swap acceptance = {rex.acceptance_rate(state):.2f}"
        )

    # the coldest replica is the sampling target
    print("T=300K replica energy:", float(state.energy[0]))


if __name__ == "__main__":
    main()
