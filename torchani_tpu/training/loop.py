"""Training step: energy(+force) loss and optax updates.

The reference's training loop (``/root/reference/examples/training.py``)
drives AdamW over the per-element networks with an energy MSE normalised by
sqrt(num_atoms), optionally adding a force MSE term computed with
``create_graph=True`` (grad-of-grad).  Here the whole step — AEV, networks,
force autodiff, loss, optimizer — is one jitted function; under a
``jax.sharding.Mesh`` the batch axis is data-parallel and the ensemble-member
axis can be sharded too (gradient reduction happens via XLA-inserted
collectives, no hand-written NCCL analog needed).
"""

import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.arch import ANI

__all__ = [
    "EpochRunner",
    "TrainState",
    "energy_force_loss",
    "make_train_step",
    "make_bucketed_train_step",
    "tune_angular_capacity",
    "tune_angular_split",
    "tune_species_partition",
]


class TrainState(struct.PyTreeNode):
    networks: tp.Any  # trainable subtree (AtomicNetworks | Ensemble)
    opt_state: tp.Any
    step: Array


def _model_with_networks(model: ANI, networks) -> ANI:
    pots = dict(model.potentials)
    # static execution hints (species partition) live on the TEMPLATE; a
    # trained/restored networks subtree must inherit them, or swapping the
    # weights in would silently drop the blocked path
    tmpl = pots["nnp"].neural_networks
    tmpl_part = getattr(tmpl, "partition", None)
    if tmpl_part is not None and getattr(networks, "partition", None) != tmpl_part:
        networks = networks.replace(partition=tmpl_part)
    pots["nnp"] = pots["nnp"].replace(neural_networks=networks)
    return model.replace(potentials=pots)


def energy_force_loss(
    model: ANI,
    species: Array,
    coords: Array,
    target_energies: Array,
    target_forces: tp.Optional[Array] = None,
    force_weight: float = 0.1,
) -> Array:
    """Reference loss: MSE(E)/sqrt(A) (+ force MSE term).

    ``examples/training.py:170-181``: energy residuals are divided by
    sqrt(num_atoms) before the mean.
    """
    elem_idxs = model._convert(species)
    num_atoms = jnp.sum(elem_idxs >= 0, axis=-1).astype(coords.dtype)

    if target_forces is None:
        energies = model(species, coords)
        return jnp.mean((energies - target_energies) ** 2 / jnp.sqrt(num_atoms))

    def esum(c):
        e = model(species, c)
        return jnp.sum(e), e

    # one forward serves both the energy residuals and the force backward
    # (value_and_grad + aux, instead of model(...) AND grad(esum))
    (_, energies), neg_forces = jax.value_and_grad(esum, has_aux=True)(coords)
    forces = -neg_forces
    e_loss = jnp.mean((energies - target_energies) ** 2 / jnp.sqrt(num_atoms))
    f_loss = jnp.mean(
        jnp.sum((forces - target_forces) ** 2, axis=(-1, -2)) / num_atoms
    )
    return e_loss + force_weight * f_loss


def _force_loss_grads_fwdrev(
    model: ANI,
    networks,
    with_networks,
    species: Array,
    coords: Array,
    target_energies: Array,
    target_forces: Array,
    force_weight: float,
):
    """Force-training loss + parameter grads via reverse-over-FORWARD.

    The standard formulation differentiates the force backward again
    (reverse-over-reverse).  Algebraically, the force-loss term's
    parameter gradient is a mixed second derivative contracted with the
    force residual:

        dL_f/dtheta = <u, dF/dtheta> = -<u, d2E/dx dtheta>
                    = -d/dtheta [ jvp_x(E_total; u) ]

    with ``u = 2 w (F - F*) / (C n)`` held constant (it carries the
    derivative of the quadratic, not a path to differentiate).  So ONE
    reverse pass over a jvp-augmented forward replaces the second
    reverse pass — same exact gradients (pinned by
    tests/test_training.py::test_fwdrev_force_grads_match), different
    program structure.
    """
    elem_idxs = model._convert(species)
    num_atoms = jnp.sum(elem_idxs >= 0, axis=-1).astype(coords.dtype)
    c = coords.shape[0]

    def esum(net, x):
        m = with_networks(net)
        e = m(species, x)
        return jnp.sum(e), e

    (_, energies), neg_forces = jax.value_and_grad(
        lambda x: esum(networks, x), has_aux=True
    )(coords)
    forces = -neg_forces
    e_res = energies - target_energies
    e_loss = jnp.mean(e_res**2 / jnp.sqrt(num_atoms))
    f_res = forces - target_forces
    f_loss = jnp.mean(jnp.sum(f_res**2, axis=(-1, -2)) / num_atoms)
    loss = e_loss + force_weight * f_loss

    u = jax.lax.stop_gradient(
        2.0 * force_weight * f_res / (c * num_atoms[:, None, None])
    )

    def h(net):
        def e_of_x(x):
            ee = with_networks(net)(species, x)
            return jnp.sum(ee), ee

        (_, ee), s = jax.jvp(e_of_x, (coords,), (u,))
        ee_loss = jnp.mean((ee - target_energies) ** 2 / jnp.sqrt(num_atoms))
        # F = -dE/dx, so <u, dF/dtheta> = -d/dtheta jvp(E; u)
        return ee_loss - s[0]

    grads = jax.grad(h)(networks)
    return loss, grads


def make_train_step(
    model_template: ANI,
    optimizer: optax.GradientTransformation,
    force_training: bool = False,
    force_weight: float = 0.1,
    nn_precision: tp.Optional[str] = "high",
    force_grad_mode: str = "revrev",
):
    """Build (init_fn, step_fn) training functions over the NN subtree.

    Only the atomic networks are trained (matching the reference setup);
    AEV constants and self energies stay frozen.  ``step_fn`` is pure and
    jit/shard_map friendly: ``(state, batch) -> (state, metrics)``.

    ``nn_precision``: TPU matmul precision for the NN chain inside the
    training step. The default "high" (3 bf16 MXU passes, ~1e-6 relative
    dot error; see `tools/nn_precision_bench.py`) halves the NN matmul
    time of a force-training step vs "highest" (6 passes) — far tighter
    than the bf16 mixed precision standard in NN training, and orders of
    magnitude tighter than the TF32 mode the reference bans.  Pass
    "highest" for strict f32 emulation or None to keep the model's own
    setting.  Saved/checkpointed weights are unaffected (precision only
    selects the matmul algorithm).
    """

    def init_fn(networks=None) -> TrainState:
        networks = (
            networks
            if networks is not None
            else model_template.potentials["nnp"].neural_networks
        )
        return TrainState(
            networks=networks,
            opt_state=optimizer.init(networks),
            step=jnp.zeros((), jnp.int32),
        )

    def loss_fn(networks, batch):
        model = _model_with_networks(model_template, networks)
        if nn_precision is not None:
            from torchani_tpu.md import _with_nn_precision

            # static-field change on the same array leaves: selects the
            # matmul algorithm only, grads still flow to `networks`
            model = _with_nn_precision(model, nn_precision)
        return energy_force_loss(
            model,
            batch["species"],
            batch["coordinates"],
            batch["energies"],
            batch.get("forces") if force_training else None,
            force_weight=force_weight,
        )

    def _with_nets(networks):
        model = _model_with_networks(model_template, networks)
        if nn_precision is not None:
            from torchani_tpu.md import _with_nn_precision

            model = _with_nn_precision(model, nn_precision)
        return model

    def step_fn(state: TrainState, batch: tp.Dict[str, Array]):
        if force_training and force_grad_mode == "fwdrev":
            loss, grads = _force_loss_grads_fwdrev(
                _with_nets(state.networks), state.networks, _with_nets,
                batch["species"], batch["coordinates"], batch["energies"],
                batch["forces"], force_weight,
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.networks, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.networks
        )
        networks = optax.apply_updates(state.networks, updates)
        new_state = TrainState(
            networks=networks, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return init_fn, step_fn


class EpochRunner:
    """Epoch driver at the benchmark's cadence: scanned steps, one host
    fetch per epoch, jitted validation.

    The naive loop — ``for b in batches: state, m = step_jit(state, b);
    float(m["loss"])`` — commits two measured tunnel traps (CLAUDE.md):
    the per-step scalar fetch blocks ~30 ms of host<->device round-trip
    per batch (it inflated early training numbers by 50%), and an
    unjitted validation pass dispatches the model op-by-op.  This runner
    instead:

    - groups consecutive same-shape (and same ``angular_capacity``
      bucket) batches into chunks of up to ``chunk`` steps, stacks each
      chunk on the host, and runs it as ONE device program
      (``lax.scan`` over the stacked batch axis) — the exact cadence the
      86.1k samples/s benchmark measures (depth-50 scans,
      docs/performance.md "Measurement rules");
    - keeps the accumulated loss as a device array, fetched once per
      epoch (transfers overlap compute: JAX dispatch is async and
      nothing blocks until that fetch);
    - validates through compiled scan programs per shape class, again
      with a single end-of-epoch fetch.

    Compiled-program budget: one program per (chunk length, batch shape
    class, capacity bucket).  Full chunks share one program; the
    leftover group of each shape class compiles one shorter scan.

    Reference counterpart: the epoch loop of
    ``/root/reference/examples/training.py:160-199`` (tqdm over batches,
    per-batch ``loss.backward()``); the cuAEV benchmark table this must
    match is ``csrc/README.md:106-113``.
    """

    def __init__(
        self,
        model_template: ANI,
        optimizer: optax.GradientTransformation,
        force_training: bool = False,
        force_weight: float = 0.1,
        nn_precision: tp.Optional[str] = "high",
        chunk: int = 50,
    ) -> None:
        self._template = model_template
        self._optimizer = optimizer
        self._force_training = force_training
        self._force_weight = force_weight
        self._nn_precision = nn_precision
        self._chunk = int(chunk)
        self._steps: tp.Dict[tp.Optional[int], tp.Any] = {}
        self._runners: tp.Dict[tp.Tuple, tp.Any] = {}
        self._val_fns: tp.Dict[tp.Tuple, tp.Any] = {}
        init_fn, _ = make_train_step(
            model_template, optimizer, force_training, force_weight,
            nn_precision,
        )
        self.init = init_fn

    # ---- batch plumbing ----
    @staticmethod
    def _to_host(batch: tp.Mapping[str, tp.Any]) -> tp.Dict[str, tp.Any]:
        """Normalize one batch to canonical host dtypes."""
        import numpy as np

        out = {}
        for k, v in batch.items():
            if k == "angular_capacity":
                continue
            a = np.asarray(v)
            if k == "species":
                a = a.astype(np.int32, copy=False)
            elif a.dtype.kind == "f":
                a = a.astype(np.float32, copy=False)
            out[k] = a
        return out

    @staticmethod
    def _shape_key(hb: tp.Mapping[str, tp.Any]) -> tp.Tuple:
        return tuple(
            sorted((k, v.shape, str(v.dtype)) for k, v in hb.items())
        )

    def _group(self, batches):
        """Yield (capacity, shape_key, [host batches]) runs of equal shape."""
        cur_key, cur = None, []
        for b in batches:
            cap = (
                int(b["angular_capacity"])
                if "angular_capacity" in b
                else None
            )
            hb = self._to_host(b)
            key = (cap, self._shape_key(hb))
            if key != cur_key or len(cur) == self._chunk:
                if cur:
                    yield cur_key[0], cur_key[1], cur
                cur_key, cur = key, []
            cur.append(hb)
        if cur:
            yield cur_key[0], cur_key[1], cur

    @staticmethod
    def _stack(group: tp.Sequence[tp.Mapping[str, tp.Any]]):
        import numpy as np

        return {
            k: jnp.asarray(np.stack([hb[k] for hb in group]))
            for k in group[0]
        }

    def _model_for(self, capacity: tp.Optional[int]) -> ANI:
        return (
            self._template
            if capacity is None
            else _model_with_angular_capacity(self._template, capacity)
        )

    # ---- training ----
    def _runner(self, capacity, length, skey):
        key = (capacity, length, skey)
        if key not in self._runners:
            if capacity not in self._steps:
                _, step = make_train_step(
                    self._model_for(capacity), self._optimizer,
                    self._force_training, self._force_weight,
                    self._nn_precision,
                )
                self._steps[capacity] = step
            step = self._steps[capacity]

            @jax.jit
            def run(state, stacked):
                def body(st, b):
                    st, m = step(st, b)
                    return st, m["loss"]

                st, losses = jax.lax.scan(body, state, stacked)
                return st, jnp.sum(losses)

            self._runners[key] = run
        return self._runners[key]

    def epoch(
        self, state: TrainState, batches: tp.Iterable[tp.Mapping[str, tp.Any]]
    ) -> tp.Tuple[TrainState, tp.Dict[str, float]]:
        """Run one epoch; returns ``(state, {"loss": mean, "steps": n})``.

        ``batches`` may be any iterable of host batch dicts (e.g.
        ``divisions["training"].shuffled(seed=epoch)``).
        """
        total = None
        n = 0
        for cap, skey, group in self._group(batches):
            stacked = self._stack(group)
            state, s = self._runner(cap, len(group), skey)(state, stacked)
            total = s if total is None else total + s
            n += len(group)
        if n == 0:
            return state, {"loss": float("nan"), "steps": 0}
        return state, {"loss": float(total) / n, "steps": n}

    # ---- validation ----
    def _val_fn(self, capacity, length, skey):
        key = (capacity, length, skey)
        if key not in self._val_fns:
            model_t = self._model_for(capacity)

            @jax.jit
            def run(networks, stacked):
                model = _model_with_networks(model_t, networks)

                def body(acc, b):
                    pred = model(b["species"], b["coordinates"])
                    err = pred - b["energies"]
                    return (
                        acc[0] + jnp.sum(err * err),
                        acc[1] + err.shape[0],
                    ), None

                (sq, cnt), _ = jax.lax.scan(
                    body, (jnp.zeros(()), 0), stacked
                )
                return sq, cnt

            self._val_fns[key] = run
        return self._val_fns[key]

    def validate(
        self, state: TrainState, batches: tp.Iterable[tp.Mapping[str, tp.Any]]
    ) -> float:
        """Energy RMSE (Ha) over ``batches``, compiled, one final fetch."""
        total = None
        count = 0
        for cap, skey, group in self._group(batches):
            stacked = self._stack(group)
            sq, cnt = self._val_fn(cap, len(group), skey)(
                state.networks, stacked
            )
            total = sq if total is None else total + sq
            count += int(cnt)
        if count == 0:
            return float("nan")
        import math as _math

        return _math.sqrt(float(total) / count)


def tune_angular_capacity(
    model: ANI,
    batches: tp.Iterable[tp.Mapping[str, tp.Any]],
    margin: float = 1.15,
    extra: int = 2,
    max_batches: int = 8,
) -> ANI:
    """Shrink the AEV angular capacity to the data's measured neighbor count.

    The angular term cost scales with ``capacity^2``; molecule batches built
    with `all_pairs` default to the full radial capacity (atoms-1 lanes)
    while typical organic molecules have ~10 neighbors within the 3.5 A
    angular cutoff.  This measures (host-side, numpy) the max within-cutoff
    neighbor count over sample batches and pins
    ``angular_capacity = ceil4(max * margin + extra)`` — the training-data
    analog of the MD driver's measured auto-capacity.  Capacity overflow at
    run time is still detected and NaN-poisons outputs (never silent), so a
    conservative margin only costs speed, not correctness.

    Returns a model copy; measured 177 -> 136 ms/step (+30% throughput) on
    the batch-2560 force-training benchmark at capacity 16 (v5e).
    """
    import numpy as np

    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    r_ang = float(aevc.angular.cutoff)
    max_count = 0
    for bi, batch in enumerate(batches):
        if bi >= max_batches:
            break
        species = np.asarray(batch["species"])
        coords = np.asarray(batch["coordinates"])
        for m in range(species.shape[0]):
            real = species[m] >= 0
            n = int(real.sum())
            if n < 2:
                continue
            pos = coords[m][real][:n]
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            max_count = max(max_count, int((d < r_ang).sum(axis=1).max()))
    cap = int(-(-int(max_count * margin + extra) // 4) * 4)
    cap = max(cap, 8)
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        aev_computer=aevc.replace(angular_capacity=cap)
    )
    return model.replace(potentials=pots)


def tune_angular_split(
    model: ANI,
    batches: tp.Iterable[tp.Mapping[str, tp.Any]],
    margin: float = 1.3,
    max_batches: int = 8,
    tail_margin: tp.Optional[float] = None,
) -> ANI:
    """Enable the count-class angular split for training batches.

    The MD driver already splits angular rows into a dense class (full
    capacity) and a sparse class (``k_small`` lanes) because pair work
    scales ~capacity^2 and most atoms sit well below the worst case
    (``md.MolecularDynamics._ensure_angular_split``).  Training batches
    have the same skew — the batch capacity is the bucket's worst
    molecule — so this measures per-atom-row angular neighbor counts over
    sample batches (host-side numpy) and applies the same cost-minimizing
    ``(k_small, n_dense)`` policy with a composition-drift margin.
    Requires an explicit ``angular_capacity`` (the bucketed pipeline sets
    one per capacity class).  A future batch exceeding the dense-row
    budget NaN-poisons the loss (the repo-wide overflow convention), so a
    drifting composition surfaces loudly — re-tune with a larger margin.
    Returns a model copy.

    A 3-tuple split additionally caps the number of evaluated rows
    (``n_rows``): zero-count padding rows past it are skipped entirely.
    That cap is a second, independent poison condition — a batch whose
    NONZERO-count row total exceeds ``n_rows`` NaN-poisons even if every
    row fits the dense budget.  Its headroom is ``tail_margin`` (default:
    a quarter of ``margin``'s excess, floored at 1.05 — the nonzero-row
    total is a whole-batch aggregate with CLT-small spread, so it needs
    much less slack than the per-row-max statistics ``margin`` protects,
    but still grows when the caller asks for drift headroom).

    Use for ENERGY-ONLY training steps: measured (v5e, batch 2560, Ka=12,
    50-deep scans, r4) e-only 10.1 -> 6.4 ms/step (+58%, 398k samples/s).
    Force training with the split is no longer catastrophic (the r2
    custom_vjp permutations transposed to scatters under grad-of-grad —
    43 ms/step; the `perm_gather` primitive fixed that) but remains a
    mild net loss there (35.5 vs 30.7 ms/step: the sort/permutation
    machinery replays across the extra AD passes while dense synthetic
    batches offer little count skew), so prefer it for energy-only
    regimes and measure before combining with ``force_training=True``.
    """
    import numpy as np

    nnp = model.potentials["nnp"]
    aevc = nnp.aev_computer
    cap = aevc.angular_capacity
    if aevc.angular_split is not None or cap is None or cap < 10:
        return model
    r_ang = float(aevc.angular.cutoff)
    per_batch_counts = []
    rows = 0
    for bi, batch in enumerate(batches):
        if bi >= max_batches:
            break
        species = np.asarray(batch["species"])
        coords = np.asarray(batch["coordinates"])
        nmol, matoms = species.shape
        counts = np.zeros(nmol * matoms, np.int64)
        for m in range(nmol):
            real = species[m] >= 0
            n = int(real.sum())
            if n < 2:
                continue
            pos = coords[m][real][:n]
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            counts[m * matoms : m * matoms + n] = (d < r_ang).sum(axis=1)
        per_batch_counts.append(np.minimum(counts, cap))
        rows = max(rows, nmol * matoms)
    if not per_batch_counts or rows == 0:
        return model
    kp = lambda k_: k_ * max(k_ - 1, 0) / 2.0  # noqa: E731
    base = rows * kp(cap)
    # Third class: zero-count rows (padded atoms — batches pad the atom
    # axis to the batch max) are skipped entirely.  Their count is a
    # whole-batch aggregate (~batch_size * mean molecule size), so its
    # batch-to-batch spread is CLT-small and the default headroom scales
    # at a quarter of ``margin``'s excess (see docstring; overridable via
    # ``tail_margin``).
    if tail_margin is None:
        tail_margin = max(1.05, 1.0 + (margin - 1.0) * 0.25)
    nonzero = max(int((c > 0).sum()) for c in per_batch_counts)
    n_rows = min(rows, int(-(-int(nonzero * tail_margin + 64) // 64) * 64))
    best = None
    # k_small == cap is the pure row-skip policy (no lane slicing): it is
    # what engages on padding-heavy but count-skew-free batches
    for k_small in list(range(6, cap - 1, 2)) + [cap]:
        over = max(int((c > k_small).sum()) for c in per_batch_counts)
        n_dense = int(-(-int(over * margin + 64) // 64) * 64)
        if n_dense >= n_rows:
            continue
        cost = n_dense * kp(cap) + (n_rows - n_dense) * kp(k_small)
        if best is None or cost < best[0]:
            best = (cost, k_small, n_dense)
    if best is None or best[0] > 0.85 * base:
        return model  # <15% estimated saving: not worth the per-step sort
    _, k_small, n_dense = best
    split = (
        (k_small, n_dense, n_rows) if n_rows < rows else (k_small, n_dense)
    )
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        aev_computer=aevc.replace(angular_split=split)
    )
    return model.replace(potentials=pots)


def tune_species_partition(
    model: ANI,
    batches: tp.Iterable[tp.Mapping[str, tp.Any]],
    margin: float = 1.2,
    quantum: int = 256,
    max_batches: int = 16,
) -> ANI:
    """Enable species-blocked NN evaluation sized to the data.

    Measures per-species atom counts over sample batches (host-side) and
    pins static per-species row budgets on the networks
    (`nn.containers.AtomicNetworks.partition`): the training step then
    permutes atom rows into species blocks and runs each species' MLP at
    its exact size over its own block, instead of every network over every
    row (S-fold redundant — profiled at ~18 ms of a 72 ms batch-2560 force
    step).  Budget overflow at run time NaN-poisons (never silent), so a
    drifting batch composition surfaces loudly — re-tune with a larger
    margin if it does.  Returns a model copy.
    """
    import numpy as np

    from torchani_tpu.nn.partition import measure_caps, supports

    nnp = model.potentials["nnp"]
    networks = nnp.neural_networks
    rows = 0
    species_iter = []
    for bi, batch in enumerate(batches):
        if bi >= max_batches:
            break
        conv = model._convert(jnp.asarray(np.asarray(batch["species"])))
        arr = np.asarray(jax.device_get(conv))
        rows = max(rows, arr.reshape(-1).shape[0])
        species_iter.append(arr)
    caps = measure_caps(
        species_iter, networks.num_species, margin=margin, quantum=quantum
    )
    if not supports(networks.num_species, rows):
        return model  # exact f32 sort keys unavailable at this scale
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        neural_networks=networks.replace(partition=caps)
    )
    return model.replace(potentials=pots)


def _model_with_angular_capacity(model: ANI, capacity: int) -> ANI:
    nnp = model.potentials["nnp"]
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        aev_computer=nnp.aev_computer.replace(angular_capacity=capacity)
    )
    return model.replace(potentials=pots)


def make_bucketed_train_step(
    model_template: ANI,
    optimizer: optax.GradientTransformation,
    force_training: bool = False,
    force_weight: float = 0.1,
):
    """`make_train_step` honoring per-batch ``angular_capacity`` metadata.

    Pairs with ``Batcher.gather_batches(density_cutoff=...)``: each batch
    carries the smallest capacity bucket covering its densest atom, and the
    step dispatches (host-side) to a jitted step compiled for that static
    capacity — one program per distinct bucket, ~capacity^2 less angular
    work for calm batches.  Batches without the key run the template's
    default capacity.
    """
    cache: tp.Dict[tp.Optional[int], tp.Any] = {}

    def get_step(capacity: tp.Optional[int]):
        if capacity not in cache:
            model = (
                model_template
                if capacity is None
                else _model_with_angular_capacity(model_template, capacity)
            )
            _, step = make_train_step(
                model, optimizer, force_training, force_weight
            )
            cache[capacity] = jax.jit(step)
        return cache[capacity]

    init_fn, _ = make_train_step(
        model_template, optimizer, force_training, force_weight
    )

    def step_fn(state: TrainState, batch: tp.Dict[str, Array]):
        cap = batch.get("angular_capacity")
        if cap is not None:
            batch = {k: v for k, v in batch.items() if k != "angular_capacity"}
            cap = int(cap)
        return get_step(cap)(state, batch)

    return init_fn, step_fn
