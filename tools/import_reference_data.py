"""Import physical-constants data from the reference TorchANI tree.

The reference (read-only, at /root/reference) ships three data resources
(torchani/resources/{atomic_constants.json, functional_d3bj_constants.json,
c6.h5}) plus the GSAES table embedded in torchani/constants.py.  These are
physical constants (atomic masses, D3 dispersion coefficients, ground-state
atomic energies, ...), i.e. *data*, which SURVEY.md SS7 stage 1 says to port
verbatim.  This script re-materialises them in formats native to this repo:

- ``torchani_tpu/resources/atomic_constants.json``  (same schema)
- ``torchani_tpu/resources/functional_d3bj_constants.json``
- ``torchani_tpu/resources/c6_constants.npz``  (HDF5 -> npz so the runtime
  needs only numpy, not h5py)
- ``torchani_tpu/resources/gsaes.json``  (extracted from the reference module)

Run:  python tools/import_reference_data.py
"""

import json
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/torchani")
OUT = Path(__file__).resolve().parent.parent / "torchani_tpu" / "resources"


def import_json() -> None:
    for name in ("atomic_constants.json", "functional_d3bj_constants.json"):
        data = json.loads((REF / "resources" / name).read_text())
        (OUT / name).write_text(json.dumps(data, indent=1, sort_keys=True))
        print(f"wrote {OUT / name}")


def import_c6() -> None:
    import h5py

    # Reference layout (torchani/potentials/dftd3.py:37-42): one HDF5 group per
    # element pair is NOT used; instead datasets keyed by znumber hold
    # (5, 5) reference-C6 tables and coordination numbers.
    out: dict = {}
    with h5py.File(REF / "resources" / "c6.h5", "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name.replace("/", ".")] = np.asarray(obj)
        f.visititems(visit)
    np.savez_compressed(OUT / "c6_constants.npz", **out)
    print(f"wrote {OUT / 'c6_constants.npz'} ({len(out)} arrays)")


def import_gsaes() -> None:
    sys.path.insert(0, "/tmp/refstub")
    sys.path.insert(0, "/root/reference")
    from torchani.constants import GSAES  # noqa: data table only

    (OUT / "gsaes.json").write_text(json.dumps(GSAES, indent=1, sort_keys=True))
    print(f"wrote {OUT / 'gsaes.json'}")


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    import_json()
    import_c6()
    import_gsaes()
