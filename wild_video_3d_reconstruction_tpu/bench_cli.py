"""Console entry point `wv3d-bench`: runs the repo-root bench.py.

The driver contract keeps `bench.py` at the repo root (it prints ONE JSON
line); this thin wrapper makes it runnable from any CWD after
`pip install -e .`.
"""

import runpy
import sys
from pathlib import Path


def main():
    root = Path(__file__).resolve().parent.parent
    bench = root / "bench.py"
    if not bench.exists():
        sys.exit("wv3d-bench: bench.py not found next to the package "
                 f"(looked in {root}); run from a source checkout")
    sys.path.insert(0, str(root))
    runpy.run_path(str(bench), run_name="__main__")


if __name__ == "__main__":
    main()
