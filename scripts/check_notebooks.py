"""Execute every notebook's code cells in-process (matplotlib Agg) so the
tutorial notebooks stay runnable as the library evolves.

Usage: python scripts/check_notebooks.py [name-substring ...]
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # notebooks must run without the chip

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

plt.show = lambda *a, **k: plt.close("all")

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_notebook(path: pathlib.Path) -> None:
    cells = json.loads(path.read_text())["cells"]
    ns: dict = {"__name__": "__main__"}
    for i, cell in enumerate(c for c in cells if c["cell_type"] == "code"):
        src = "".join(cell["source"])
        print(f"  cell {i}...", flush=True)
        exec(compile(src, f"{path.name}[cell {i}]", "exec"), ns)


def main() -> None:
    filters = sys.argv[1:]
    for nb in sorted((REPO / "notebooks").glob("*.ipynb")):
        if filters and not any(f in nb.name for f in filters):
            continue
        print(f"== {nb.name}", flush=True)
        run_notebook(nb)
        print(f"== {nb.name} OK", flush=True)


if __name__ == "__main__":
    main()
