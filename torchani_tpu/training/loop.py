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

__all__ = ["TrainState", "energy_force_loss", "make_train_step"]


class TrainState(struct.PyTreeNode):
    networks: tp.Any  # trainable subtree (AtomicNetworks | Ensemble)
    opt_state: tp.Any
    step: Array


def _model_with_networks(model: ANI, networks) -> ANI:
    pots = dict(model.potentials)
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
        return jnp.sum(model(species, c))

    energies = model(species, coords)
    forces = -jax.grad(esum)(coords)
    e_loss = jnp.mean((energies - target_energies) ** 2 / jnp.sqrt(num_atoms))
    f_loss = jnp.mean(
        jnp.sum((forces - target_forces) ** 2, axis=(-1, -2)) / num_atoms
    )
    return e_loss + force_weight * f_loss


def make_train_step(
    model_template: ANI,
    optimizer: optax.GradientTransformation,
    force_training: bool = False,
    force_weight: float = 0.1,
):
    """Build (init_fn, step_fn) training functions over the NN subtree.

    Only the atomic networks are trained (matching the reference setup);
    AEV constants and self energies stay frozen.  ``step_fn`` is pure and
    jit/shard_map friendly: ``(state, batch) -> (state, metrics)``.
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
        return energy_force_loss(
            model,
            batch["species"],
            batch["coordinates"],
            batch["energies"],
            batch.get("forces") if force_training else None,
            force_weight=force_weight,
        )

    def step_fn(state: TrainState, batch: tp.Dict[str, Array]):
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
