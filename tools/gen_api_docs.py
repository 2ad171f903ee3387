"""Generate docs/api.md from the package's public surface.

The reference ships a sphinx API reference built from docstrings
(``/root/reference/docs/src/index.rst``); sphinx isn't available in this
environment, so this renders the same information — every public module,
its one-line summary, and each ``__all__`` export with its docstring
head — as checked-in markdown.  Re-run after adding exports:

    python tools/gen_api_docs.py
"""

import importlib
import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODULES = [
    "torchani_tpu", "torchani_tpu.models", "torchani_tpu.arch",
    "torchani_tpu.aev.computer", "torchani_tpu.aev.terms",
    "torchani_tpu.cutoffs", "torchani_tpu.neighbors",
    "torchani_tpu.nn.core", "torchani_tpu.nn.containers",
    "torchani_tpu.nn.shared", "torchani_tpu.nn.partition",
    "torchani_tpu.potentials.core", "torchani_tpu.potentials.repulsion",
    "torchani_tpu.potentials.dispersion", "torchani_tpu.potentials.lj",
    "torchani_tpu.potentials.fixed_coulomb", "torchani_tpu.potentials.nnp",
    "torchani_tpu.sae", "torchani_tpu.electro", "torchani_tpu.grad",
    "torchani_tpu.md", "torchani_tpu.optimize", "torchani_tpu.neb",
    "torchani_tpu.replica", "torchani_tpu.observables",
    "torchani_tpu.ase", "torchani_tpu.io",
    "torchani_tpu.datasets", "torchani_tpu.datasets.anidataset",
    "torchani_tpu.datasets.backends", "torchani_tpu.datasets.batching",
    "torchani_tpu.datasets.filters", "torchani_tpu.transforms",
    "torchani_tpu.sae_estimation", "torchani_tpu.legacy_data",
    "torchani_tpu.neurochem", "torchani_tpu.convert",
    "torchani_tpu.training", "torchani_tpu.parallel",
    "torchani_tpu.units", "torchani_tpu.utils", "torchani_tpu.profiling",
    "torchani_tpu.testing", "torchani_tpu.cli",
]


def main() -> None:
    import jax

    if jax.default_backend() != "cpu":  # docs need no device
        jax.config.update("jax_platforms", "cpu")
    out = [
        "# API reference", "",
        "Generated from the package's public (`__all__`) surface by",
        "`tools/gen_api_docs.py`; regenerate after adding exports.  See",
        "`docs/user-guide.md` for task-oriented documentation and",
        "`docs/migration.md` for the TorchANI name map.", "",
    ]
    for name in MODULES:
        m = importlib.import_module(name)
        doc = (inspect.getdoc(m) or "").strip().splitlines()
        out.append(f"## `{name}`")
        out.append("")
        if doc and doc[0]:
            out.append(doc[0])
            out.append("")
        pub = getattr(m, "__all__", None)
        if not pub:
            pub = [
                n
                for n in dir(m)
                if not n.startswith("_")
                and getattr(getattr(m, n), "__module__", "") == name
            ]
        for n in sorted(pub):
            try:
                obj = getattr(m, n)
            except AttributeError:
                continue
            d = (inspect.getdoc(obj) or "").strip().splitlines()
            s = d[0] if d else ""
            if len(s) > 110:
                s = s[:107] + "..."
            kind = (
                "class"
                if inspect.isclass(obj)
                else "function" if callable(obj) else "data"
            )
            out.append(
                f"- **`{n}`** ({kind}) — {s}" if s else f"- **`{n}`** ({kind})"
            )
        out.append("")
    path = Path(__file__).resolve().parent.parent / "docs" / "api.md"
    path.write_text("\n".join(out))
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
