"""Minimal compile probe for bucket_refresh Pallas kernels (TPU).

Compiles the fwd and bwd selection kernels one at a time at tiny G to
isolate Mosaic compile hangs from full-size runs. Prints a timestamped
line after each stage.

    python tools/bucketdot_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.bucket_refresh import (
    _bucket_select_bwd,
    _bucket_select_fwd,
    _split3,
)

G, C, K = 2, 64, 120
R = C * K


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rng = np.random.RandomState(0)
    cand_np = rng.randn(G, 3, 32, C).astype(np.float32) * 20.0
    cand_np[:, :, 27:] = 0.0
    cand = jnp.asarray(cand_np.reshape(G, 96, C))
    o = rng.randint(0, 27, (G, R))
    rank = rng.randint(0, C, (G, R))
    keys_np = np.where(rng.rand(G, R) < 0.75, (o << 8) | rank, 27 << 8)
    keys = jnp.asarray(keys_np.astype(np.int32))

    stamp("compiling fwd ...")
    out = jax.jit(lambda c, k: _bucket_select_fwd(_split3(c), k))(cand, keys)
    s = float(jnp.sum(out))
    stamp(f"fwd done, sum={s:.3f}")

    gt = jnp.asarray(rng.randn(G, 3, R).astype(np.float32))

    def bwd(g3, k):
        hi, mid, lo = _split3(g3)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        return _bucket_select_bwd(g16, k, C)

    stamp("compiling bwd ...")
    dout = jax.jit(bwd)(gt, keys)
    s = float(jnp.sum(dout))
    stamp(f"bwd done, sum={s:.3f}")


if __name__ == "__main__":
    main()
