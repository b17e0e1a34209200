"""Build the --py-files zip for cluster submission (north rule).

    python scripts/build_pyfiles.py [dist/lingua_spark.zip]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from lingua_spark.engine.udfs import build_package_zip

    dest = Path(sys.argv[1] if len(sys.argv) > 1 else REPO / "dist" / "lingua_spark.zip")
    dest.parent.mkdir(parents=True, exist_ok=True)
    print(build_package_zip(str(dest)))


if __name__ == "__main__":
    main()
