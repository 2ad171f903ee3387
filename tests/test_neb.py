"""NEB transition-state search tests.

Validated against the Mueller-Brown analytic surface, whose minima and
saddle points are known to high precision — the climbing image must land on
the A<->C saddle at (-0.822, 0.624), E = -40.665 (the classic NEB
correctness check), independent of any NN model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.neb import neb_path

_A = jnp.asarray([-200.0, -100.0, -170.0, 15.0])
_a = jnp.asarray([-1.0, -1.0, -6.5, 0.7])
_b = jnp.asarray([0.0, 0.0, 11.0, 0.6])
_c = jnp.asarray([-10.0, -10.0, -6.5, 0.7])
_x0 = jnp.asarray([1.0, 0.0, -0.5, -1.0])
_y0 = jnp.asarray([0.0, 0.5, 1.5, 1.0])


def mueller_brown(images):
    """(I, 1, 3) -> (I,); z is ignored (flat)."""
    x = images[:, 0, 0][:, None]
    y = images[:, 0, 1][:, None]
    dx = x - _x0[None, :]
    dy = y - _y0[None, :]
    v = _A[None, :] * jnp.exp(_a * dx**2 + _b * dx * dy + _c * dy**2)
    return jnp.sum(v, axis=1)


MIN_A = (-0.5582, 1.4417)  # E = -146.70
MIN_C = (-0.0500, 0.4667)  # E = -80.77
SADDLE_AC = (-0.8220, 0.6243)  # E = -40.665


def _linear_band(p0, p1, n):
    t = np.linspace(0.0, 1.0, n)[:, None]
    xy = (1 - t) * np.asarray(p0) + t * np.asarray(p1)
    band = np.zeros((n, 1, 3), np.float32)
    band[:, 0, :2] = xy
    return band


def test_neb_finds_mueller_brown_saddle():
    band = _linear_band(MIN_A, MIN_C, 13)
    st = neb_path(
        mueller_brown,
        jnp.asarray(band),
        k_spring=1.0,
        climb=True,
        max_steps=1500,
        fmax=0.02,
        dt_start=0.005,
        dt_max=0.02,
    )
    assert float(st.fmax) <= 0.02, f"did not converge: fmax={float(st.fmax)}"
    # endpoints never move
    np.testing.assert_array_equal(np.asarray(st.images[0]), band[0])
    np.testing.assert_array_equal(np.asarray(st.images[-1]), band[-1])
    ci = int(jnp.argmax(st.energies[1:-1])) + 1
    x, y = float(st.images[ci, 0, 0]), float(st.images[ci, 0, 1])
    e = float(st.energies[ci])
    assert abs(x - SADDLE_AC[0]) < 0.03 and abs(y - SADDLE_AC[1]) < 0.03, (
        f"climbing image at ({x:.3f}, {y:.3f}), expected {SADDLE_AC}"
    )
    assert abs(e - (-40.665)) < 0.5, f"saddle energy {e:.3f}"


def test_neb_with_ani_model_runs():
    """Band of a bond-stretch path through an ANI model: shapes, finiteness,
    frozen endpoints (random weights — no physical assertion)."""
    import torchani_tpu as tt

    model = tt.simple_ani(
        ("H", "C", "N", "O"), ensemble_size=1, key=jax.random.PRNGKey(5)
    )
    species = jnp.asarray([[8, 1, 1]] * 7)
    base = np.array(
        [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
        np.float32,
    )
    band = np.stack([base * (0.95 + 0.02 * i) for i in range(7)])

    def energy_fn(x):
        return model(species, x)

    st = neb_path(energy_fn, jnp.asarray(band), max_steps=40, fmax=1e-9)
    assert int(st.step) == 40  # fmax unreachable: all steps ran
    assert bool(jnp.all(jnp.isfinite(st.energies)))
    np.testing.assert_array_equal(np.asarray(st.images[0]), band[0])
    np.testing.assert_array_equal(np.asarray(st.images[-1]), band[-1])
