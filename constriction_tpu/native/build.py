"""Build the native host codec: `python -m constriction_tpu.native.build`.

Produces ``libctpu.so`` next to ``codec.cpp``.  Uses a plain g++ invocation
(no pybind11 dependency; the Python side binds via ctypes).
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "codec.cpp")
OUT = os.path.join(HERE, "libctpu.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++",
        "-O3",
        # portable ISA baseline: the .so is built on first import, and a
        # -march=native binary copied between machines can SIGILL
        "-fopenmp",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        OUT,
        SRC,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
