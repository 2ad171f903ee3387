"""Constructing a model from legacy NeuroChem files.

Analog of ``/root/reference/examples/neurochem_loading.py``. NeuroChem is the
original ANI C++ code; its ``.params`` (AEV constants), ``.nnf``/``.wparam``/
``.bparam`` (network specs + weights) and ``sae_*.dat`` (self energies) files
are parsed by ``torchani_tpu.neurochem`` into native pytree modules.

This environment has no network egress, so the published parameter archive
cannot be downloaded. Point TORCHANI_TPU_NEUROCHEM at an extracted
``ani-model-zoo`` directory to run the full load; without it this example
parses a small in-repo sample and exits.

    python examples/neurochem_loading.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from torchani_tpu import neurochem

    root = os.environ.get("TORCHANI_TPU_NEUROCHEM")
    if root is None:
        # No model zoo available: demonstrate the .params parser on a
        # synthetic constants file with the ANI-1x layout.
        sample = Path("/tmp/rHCNO-5.2R_16-3.5A_a4-8.params")
        sample.write_text(
            "Rcr = 5.2000e+00\n"
            "Rca = 3.5000e+00\n"
            "EtaR = [1.6000000e+01]\n"
            "ShfR = [9.0000000e-01,1.1687500e+00,1.4375000e+00,1.7062500e+00]\n"
            "Zeta = [3.2000000e+01]\n"
            "ShfZ = [1.9634954e-01,5.8904862e-01,9.8174770e-01,1.3744468e+00]\n"
            "EtaA = [8.0000000e+00]\n"
            "ShfA = [9.0000000e-01,1.5500000e+00,2.2000000e+00,2.8500000e+00]\n"
            "Atyp = [H,C,N,O]\n"
        )
        aevc, symbols = neurochem.load_aev_computer_and_symbols(sample)
        print("parsed constants:", symbols, "AEV length", aevc.out_dim)
        print("set TORCHANI_TPU_NEUROCHEM=<ani-model-zoo dir> for a full load")
        return

    root = Path(root)
    info = next(root.rglob("*.info"), None)
    if info is not None:
        # .info files list the constants/sae/network dirs of a full ensemble.
        model = neurochem.load_model_from_info(info)
        print("loaded model:", type(model).__name__)
    else:
        # Or load the pieces by hand: one member = AEV constants + networks.
        consts = next(root.rglob("*.params"))
        sae = next(root.rglob("sae_*.dat"))
        member_dir = next(p for p in root.rglob("train0") if p.is_dir())
        aevc, networks, symbols = neurochem.load_member(
            member_dir / "networks", consts
        )
        shifter = neurochem.load_sae(sae)
        print("loaded member for", symbols, "AEV length", aevc.out_dim,
              "SAE count", len(shifter.symbols))


if __name__ == "__main__":
    main()
