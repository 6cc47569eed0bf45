"""Build the native data-plane shared library.

Run: ``python -m sprc_tpu.native.build`` (or it is invoked lazily on first
use by :mod:`sprc_tpu.data.native`).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "dataplane.cpp")
OUT = os.path.join(HERE, "libsprc_dataplane.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", OUT, "-ljpeg", "-lpng",
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
