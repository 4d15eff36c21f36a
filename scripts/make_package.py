"""Build dist/linkgraph.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "linkgraph.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "linkgraph").glob("*.py")):
            z.write(py, f"linkgraph/{py.name}")
    print(out)


if __name__ == "__main__":
    main()
