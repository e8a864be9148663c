"""Build the native solver shared library (g++ -O2 -shared).

Compiled lazily on first import of diffusionsat_tpu.sat.solvers; the .so is
cached next to the source and rebuilt when solver.cpp is newer.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_SRC = Path(__file__).parent / "solver.cpp"
_LIB = Path(__file__).parent / "libdsat.so"


def build(force: bool = False) -> Path:
    if not force and _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-march=native",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


if __name__ == "__main__":
    print(build(force=True))
