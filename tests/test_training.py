"""Training infrastructure tests: steps, checkpoints, schedules, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import torchani_tpu as tt
from torchani_tpu.testing import make_molecs
from torchani_tpu.training import (
    ReduceLROnPlateau,
    TrainState,
    adamw_with_plateau,
    load_checkpoint,
    make_train_step,
    merge_members,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    species, coords = make_molecs(16, 8, seed=0)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(1).randn(16).astype(np.float32) * 0.01
        ),
        "forces": jnp.zeros((16, 8, 3), jnp.float32),
    }
    return model, batch


def test_train_step_reduces_loss(setup):
    model, batch = setup
    init_fn, step_fn = make_train_step(model, optax.adam(1e-3))
    state = init_fn()
    step_jit = jax.jit(step_fn)
    losses = []
    for _ in range(15):
        state, metrics = step_jit(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 15


def test_force_training_step(setup):
    model, batch = setup
    init_fn, step_fn = make_train_step(
        model, optax.adam(1e-3), force_training=True
    )
    state = init_fn()
    state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_angular_split_step_matches_unsplit():
    """`tune_angular_split` must leave the training loss numerically
    unchanged (the count-class split is a pure execution-layout choice),
    for both energy-only and force training."""
    from torchani_tpu.training import tune_angular_split
    from torchani_tpu.training.loop import _model_with_angular_capacity

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    # enough rows that a dense class under the row count exists
    species, coords = make_molecs(48, 12, seed=5)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(2).randn(48).astype(np.float32) * 0.01
        ),
        "forces": jnp.zeros((48, 12, 3), jnp.float32),
    }
    base = _model_with_angular_capacity(model, 12)
    host = {
        "species": np.asarray(batch["species"]),
        "coordinates": np.asarray(batch["coordinates"]),
    }
    split = tune_angular_split(base, [host], margin=2.0)
    aevc = split.potentials["nnp"].aev_computer
    assert aevc.angular_split is not None, "split should engage here"

    for force_training in (False, True):
        losses = []
        for m in (base, split):
            init_fn, step_fn = make_train_step(
                m, optax.adam(1e-3), force_training=force_training
            )
            state = init_fn()
            _, metrics = jax.jit(step_fn)(state, batch)
            losses.append(float(metrics["loss"]))
        np.testing.assert_allclose(losses[0], losses[1], rtol=2e-6)


def test_angular_row_skip_matches_unsplit_on_padded_batch():
    """The 3-tuple split's empty class (zero-count rows emitted as zeros)
    must be exact on padding-heavy batches, for energy-only and force
    training, and must NaN-poison when nonzero-count rows overflow it."""
    from torchani_tpu.testing import make_chain_molecs
    from torchani_tpu.training import tune_angular_split
    from torchani_tpu.training.loop import _model_with_angular_capacity

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    # chain molecules at max 20: mean ~11 real atoms -> ~45% padding rows
    species, coords = make_chain_molecs(64, 20, seed=7)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(3).randn(64).astype(np.float32) * 0.01
        ),
        "forces": jnp.zeros((64, 20, 3), jnp.float32),
    }
    base = _model_with_angular_capacity(model, 12)
    host = {
        "species": np.asarray(batch["species"]),
        "coordinates": np.asarray(batch["coordinates"]),
    }
    split = tune_angular_split(base, [host], margin=2.0)
    aevc = split.potentials["nnp"].aev_computer
    assert aevc.angular_split is not None, "split should engage here"
    assert len(aevc.angular_split) == 3, "padding should enable the row cap"
    assert aevc.angular_split[2] < 64 * 20

    for force_training in (False, True):
        losses = []
        for m in (base, split):
            init_fn, step_fn = make_train_step(
                m, optax.adam(1e-3), force_training=force_training
            )
            state = init_fn()
            _, metrics = jax.jit(step_fn)(state, batch)
            losses.append(float(metrics["loss"]))
        np.testing.assert_allclose(losses[0], losses[1], rtol=2e-6)

    # overflow: a row cap below the nonzero-count row total must poison
    k_small, n_dense, _ = aevc.angular_split
    real_rows = int((np.asarray(species) >= 0).sum())
    bad = _with_split(base, (k_small, n_dense, max(n_dense + 1, 128)))
    assert max(n_dense + 1, 128) < real_rows
    init_fn, step_fn = make_train_step(bad, optax.adam(1e-3))
    _, metrics = jax.jit(step_fn)(init_fn(), batch)
    assert not np.isfinite(float(metrics["loss"]))


def _with_split(model, split):
    nnp = model.potentials["nnp"]
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        aev_computer=nnp.aev_computer.replace(angular_split=split)
    )
    return model.replace(potentials=pots)


def test_checkpoint_roundtrip(setup, tmp_path):
    model, batch = setup
    init_fn, step_fn = make_train_step(model, optax.adam(1e-3))
    state = init_fn()
    state, _ = jax.jit(step_fn)(state, batch)
    save_checkpoint(tmp_path, state, int(state.step))
    restored = load_checkpoint(tmp_path, state)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state.networks), jax.tree.leaves(restored.networks)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_plateau_scheduler():
    sched = ReduceLROnPlateau(initial_lr=1.0, factor=0.5, patience=2)
    for metric in [1.0, 0.9, 0.8]:
        assert sched.update(metric) == 1.0  # improving
    for metric in [0.85, 0.85, 0.85]:
        lr = sched.update(metric)
    assert lr == 0.5  # reduced after patience exceeded


def test_adamw_with_plateau_wires():
    opt, plateau = adamw_with_plateau(1e-3)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    assert "learning_rate" in state.hyperparams


def test_merge_members():
    from torchani_tpu.nn import AtomicNetworks

    members = [
        AtomicNetworks.like_1x(key=jax.random.PRNGKey(i)) for i in range(3)
    ]
    ens = merge_members(members)
    assert ens.total_members_num == 3


def test_multichip_dryrun_entrypoint():
    """The driver's dryrun path must work on the virtual CPU mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    n = max(1, len(jax.devices()))
    if n >= 2:
        g.dryrun_multichip(n if n % 2 == 0 else n - (n % 2))
    else:
        pytest.skip("single device session")


def test_density_bucketed_batching_and_step(tmp_path):
    """Batches carry per-batch angular capacities; the bucketed step
    dispatches to capacity-pinned programs and trains with finite loss."""
    import optax

    from torchani_tpu import simple_ani
    from torchani_tpu.datasets import ANIDataset, Batcher
    from torchani_tpu.testing import make_chain_molecs
    from torchani_tpu.training import make_bucketed_train_step

    ds = ANIDataset(tmp_path / "t.h5")
    sp, co = make_chain_molecs(48, 12, seed=3)
    ds.append_conformers(
        "g0",
        {
            "species": sp,
            "coordinates": co,
            "energies": np.random.RandomState(0).randn(48) - 40,
            "forces": np.random.RandomState(1).randn(48, 12, 3) * 0.01,
        },
    )
    batcher = Batcher(rng_seed=5)
    divs = batcher.divide(ds, splits={"training": 1.0})
    batches = batcher.gather_batches(
        ds, divs["training"], 16, density_cutoff=3.5
    )
    caps = [int(b["angular_capacity"]) for b in batches]
    assert all(c in (8, 12, 16, 20, 24, 32, 48, 64) for c in caps)
    # density sorting should put the calmer batches first
    assert caps == sorted(caps)
    model = simple_ani(("H", "C", "N", "O"), ensemble_size=1, repulsion=False)
    init_fn, step_fn = make_bucketed_train_step(
        model, optax.adamw(1e-3), force_training=True
    )
    state = init_fn()
    losses = []
    for batch in batches:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, jb)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == len(batches)


def test_bucketed_step_matches_full_capacity(tmp_path):
    """A capacity large enough to be a no-op must give identical loss to
    the default step (the repack is exact, not approximate)."""
    import optax

    from torchani_tpu import simple_ani
    from torchani_tpu.testing import make_chain_molecs
    from torchani_tpu.training import make_bucketed_train_step, make_train_step

    model = simple_ani(("H", "C", "N", "O"), ensemble_size=1, repulsion=False)
    sp, co = make_chain_molecs(8, 10, seed=11)
    batch = {
        "species": jnp.asarray(sp),
        "coordinates": jnp.asarray(co),
        "energies": jnp.asarray(
            np.random.RandomState(2).randn(8).astype(np.float32)
        ),
        "forces": jnp.zeros((8, 10, 3), jnp.float32),
    }
    init_fn, plain_step = make_train_step(
        model, optax.adamw(1e-3), force_training=True
    )
    _, bucketed = make_bucketed_train_step(
        model, optax.adamw(1e-3), force_training=True
    )
    s0 = init_fn()
    _, m_plain = plain_step(s0, batch)
    _, m_b = bucketed(s0, {**batch, "angular_capacity": np.int32(9)})
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_b["loss"]), rtol=1e-6
    )


def test_data_parallel_step_matches_single_device():
    """One optimization step on an 8-device (4 data x 2 model) mesh must
    reproduce the single-device step: same loss, same updated parameters
    (up to f32 cross-device reduction order).  This is the numerical
    guarantee behind the sharded training path (parallel/sharding.py) —
    GSPMD may not change the math."""
    from torchani_tpu.parallel import make_mesh, shard_batch, shard_ensemble

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")

    model = tt.simple_ani(("H", "O"), ensemble_size=2, key=jax.random.PRNGKey(5))
    species, coords = make_molecs(8, 6, seed=2, znums=(1, 8))
    rng = np.random.RandomState(3)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(rng.randn(8).astype(np.float32) * 0.01),
        "forces": jnp.asarray(rng.randn(8, 6, 3).astype(np.float32) * 0.01),
    }
    optimizer = optax.adamw(1e-3)
    init_fn, step_fn = make_train_step(model, optimizer, force_training=True)

    state1 = init_fn()
    state1 = state1.replace(opt_state=optimizer.init(state1.networks))
    new1, metrics1 = jax.jit(step_fn)(state1, batch)

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        state8 = init_fn()
        state8 = state8.replace(networks=shard_ensemble(state8.networks, mesh))
        state8 = state8.replace(opt_state=optimizer.init(state8.networks))
        new8, metrics8 = jax.jit(step_fn)(state8, shard_batch(batch, mesh))
        jax.block_until_ready(metrics8["loss"])

    assert float(metrics1["loss"]) == pytest.approx(
        float(metrics8["loss"]), rel=1e-6
    )
    flat1 = jax.tree.leaves(new1.networks)
    flat8 = jax.tree.leaves(new8.networks)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
        )


def test_metrics_writer_roundtrip(tmp_path):
    from torchani_tpu.training import MetricsWriter, read_metrics

    path = tmp_path / "run" / "metrics.jsonl"
    with MetricsWriter(path, csv_mirror=True) as w:
        w.write(0, {"loss": jnp.asarray(1.5), "lr": 1e-3})
        w.write(1, {"loss": 1.25, "lr": 1e-3, "val_rmse": 0.2})
    cols = read_metrics(path)
    assert cols["step"] == [0.0, 1.0]
    assert cols["loss"] == [1.5, 1.25]
    assert np.isnan(cols["val_rmse"][0]) and cols["val_rmse"][1] == 0.2
    csv_text = (tmp_path / "run" / "metrics.csv").read_text()
    assert csv_text.startswith("step,time,loss,lr")
    # appending to an existing file keeps prior records
    with MetricsWriter(path) as w:
        w.write(2, {"loss": 1.0})
    assert len(read_metrics(path)["step"]) == 3


def test_epoch_runner_matches_per_batch_loop(tmp_path):
    """EpochRunner's scanned chunks produce the same parameter trajectory
    and loss mean as the naive per-batch step loop, and its compiled
    validation matches the unjitted RMSE."""
    from torchani_tpu.training import EpochRunner
    from torchani_tpu.training.loop import _model_with_networks

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    rng = np.random.RandomState(0)
    batches = []
    for i in range(5):
        species, coords = make_molecs(8, 6, seed=i)
        batches.append(
            {
                "species": species,
                "coordinates": coords,
                "energies": rng.randn(8).astype(np.float64) * 0.01,
            }
        )
    # one odd-shaped batch exercises the shape-class grouping
    species, coords = make_molecs(8, 7, seed=9)
    batches.append(
        {
            "species": species,
            "coordinates": coords,
            "energies": rng.randn(8).astype(np.float64) * 0.01,
        }
    )

    optimizer = optax.adam(1e-3)
    runner = EpochRunner(model, optimizer, chunk=3, nn_precision=None)
    state = runner.init()
    state_r, metrics = runner.epoch(state, batches)
    assert metrics["steps"] == 6

    init_fn, step_fn = make_train_step(model, optimizer, nn_precision=None)
    state_n = init_fn()
    step_jit = jax.jit(step_fn)
    losses = []
    for b in batches:
        jb = {
            "species": jnp.asarray(np.asarray(b["species"], np.int32)),
            "coordinates": jnp.asarray(
                np.asarray(b["coordinates"], np.float32)
            ),
            "energies": jnp.asarray(np.asarray(b["energies"], np.float32)),
        }
        state_n, m = step_jit(state_n, jb)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(
        metrics["loss"], np.mean(losses), rtol=1e-5
    )
    ref_leaves = jax.tree_util.tree_leaves(state_n.networks)
    run_leaves = jax.tree_util.tree_leaves(state_r.networks)
    for a, b in zip(ref_leaves, run_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )

    # validation parity vs the unjitted eager pass
    rmse = runner.validate(state_r, batches)
    m = _model_with_networks(model, state_r.networks)
    errs = []
    for b in batches:
        pred = m(
            jnp.asarray(np.asarray(b["species"], np.int32)),
            jnp.asarray(np.asarray(b["coordinates"], np.float32)),
        )
        errs.append(np.asarray(pred) - np.asarray(b["energies"]))
    ref_rmse = float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))
    np.testing.assert_allclose(rmse, ref_rmse, rtol=1e-4)


def test_epoch_runner_honors_capacity_buckets():
    """Batches stamped with different angular_capacity buckets compile and
    run through their own programs within one epoch."""
    from torchani_tpu.training import EpochRunner

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    rng = np.random.RandomState(1)
    batches = []
    for cap in (8, 12):
        for i in range(2):
            species, coords = make_molecs(6, 8, seed=10 * cap + i)
            batches.append(
                {
                    "species": species,
                    "coordinates": coords,
                    "energies": rng.randn(6).astype(np.float64) * 0.01,
                    "angular_capacity": np.asarray(cap, np.int32),
                }
            )
    runner = EpochRunner(model, optax.adam(1e-3), chunk=4)
    state = runner.init()
    state, metrics = runner.epoch(state, batches)
    assert metrics["steps"] == 4
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(runner.validate(state, batches))


def test_fwdrev_force_grads_match():
    """force_grad_mode="fwdrev" (reverse-over-jvp) must produce the same
    loss and parameter updates as the standard reverse-over-reverse."""
    from torchani_tpu.testing import make_chain_molecs

    model = tt.simple_ani(
        ("H", "C", "N", "O"), ensemble_size=1, key=jax.random.PRNGKey(0)
    )
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    sp, co = make_chain_molecs(16, 12, seed=3)
    rng = np.random.RandomState(0)
    batch = {
        "species": jnp.asarray(sp.astype(np.int32)),
        "coordinates": jnp.asarray(co),
        "energies": jnp.asarray(rng.randn(16).astype(np.float32) * 0.01),
        "forces": jnp.asarray(rng.randn(16, 12, 3).astype(np.float32) * 0.01),
    }
    opt = optax.adam(1e-3)
    outs = {}
    for mode in ("revrev", "fwdrev"):
        init_fn, step_fn = make_train_step(
            model, opt, force_training=True, nn_precision=None,
            force_grad_mode=mode,
        )
        st2, m = jax.jit(step_fn)(init_fn(), batch)
        outs[mode] = (float(m["loss"]), st2.networks)
    np.testing.assert_allclose(outs["revrev"][0], outs["fwdrev"][0], rtol=1e-7)
    for a, b in zip(
        jax.tree.leaves(outs["revrev"][1]), jax.tree.leaves(outs["fwdrev"][1])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7
        )
