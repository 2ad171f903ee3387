"""Learning-demonstration tests (BASELINE config 3's correctness leg).

The big reference-labeled run lives in ``tools/learning_run.py`` (its
artifacts feed docs/performance.md "Learning run"); these tests pin the
same loop at test size: a descending validation RMSE over epochs, and
bitwise checkpoint/resume equivalence of the full
EpochRunner + AdamW + reduce-on-plateau recipe (reference counterpart:
``/root/reference/examples/training.py:76-199``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.training import EpochRunner
from torchani_tpu.training.checkpoints import load_checkpoint, save_checkpoint
from torchani_tpu.training.schedules import adamw_with_plateau

SYMBOLS = ("H", "C", "N", "O")


@pytest.fixture(scope="module")
def labeled_batches():
    """Teacher-labeled conformer batches (teacher = fixed-seed simple_ani)."""
    from torchani_tpu.testing import make_chain_molecs

    teacher = tt.simple_ani(SYMBOLS, key=jax.random.PRNGKey(99))
    teacher = teacher.replace(
        energy_shifter=teacher.energy_shifter.replace(enabled=False)
    )
    rng = np.random.RandomState(5)
    base_sp, base_xyz = make_chain_molecs(48, 10, seed=11)
    sp = np.repeat(base_sp, 4, axis=0)
    xyz = np.repeat(base_xyz, 4, axis=0)
    xyz = xyz + rng.randn(*xyz.shape).astype(np.float32) * 0.05
    energies = np.asarray(teacher(jnp.asarray(sp), jnp.asarray(xyz)))
    batches = []
    for i0 in range(0, sp.shape[0], 32):
        batches.append(
            {
                "species": jnp.asarray(sp[i0 : i0 + 32].astype(np.int32)),
                "coordinates": jnp.asarray(xyz[i0 : i0 + 32]),
                "energies": jnp.asarray(energies[i0 : i0 + 32]),
            }
        )
    return batches[:-1], batches[-1:]  # train, val


def _student():
    model = tt.simple_ani(SYMBOLS, ensemble_size=1, key=jax.random.PRNGKey(3))
    return model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )


def test_val_rmse_descends(labeled_batches):
    train_b, val_b = labeled_batches
    optimizer, plateau = adamw_with_plateau(3e-4)
    runner = EpochRunner(_student(), optimizer, nn_precision=None)
    state = runner.init()
    rmses = [runner.validate(state, val_b)]
    for epoch in range(5):
        state, m = runner.epoch(state, train_b)
        assert np.isfinite(m["loss"])
        rmses.append(runner.validate(state, val_b))
    # learning happened: clearly better than init (the tiny set bounds how
    # far it can descend; the full curve artifact is tools/learning_run.py)
    assert rmses[-1] < rmses[0] * 0.8, rmses
    assert min(rmses[1:]) < rmses[0], rmses


def test_resume_matches_uninterrupted(labeled_batches, tmp_path):
    """2 epochs + checkpoint + fresh-runner restore + 2 epochs must equal
    4 uninterrupted epochs exactly (same compiled programs, f32 state
    round-trips bitwise through orbax)."""
    train_b, val_b = labeled_batches
    results = []
    for interrupted in (False, True):
        optimizer, plateau = adamw_with_plateau(1e-3)
        plateau.patience = 1
        runner = EpochRunner(_student(), optimizer, nn_precision=None)
        state = runner.init()
        for epoch in range(2):
            state, _ = runner.epoch(state, train_b)
            lr = plateau.update(runner.validate(state, val_b))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, jnp.float32
            )
        if interrupted:
            save_checkpoint(
                tmp_path / "ck",
                (state, plateau.lr, plateau.best, plateau.bad_epochs),
                2,
            )
            # fresh runner/optimizer objects — the "new process"
            optimizer, plateau2 = adamw_with_plateau(1e-3)
            plateau2.patience = 1
            runner = EpochRunner(_student(), optimizer, nn_precision=None)
            template = (runner.init(), 0.0, 0.0, 0)
            state, lr_saved, best, bad = load_checkpoint(
                tmp_path / "ck", template
            )
            plateau2.lr = float(lr_saved)
            plateau2.best = float(best)
            plateau2.bad_epochs = int(bad)
            plateau = plateau2
        for epoch in range(2, 4):
            state, m = runner.epoch(state, train_b)
            lr = plateau.update(runner.validate(state, val_b))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, jnp.float32
            )
        results.append((m["loss"], runner.validate(state, val_b)))
    (loss_a, rmse_a), (loss_b, rmse_b) = results
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    np.testing.assert_allclose(rmse_a, rmse_b, rtol=1e-6)
