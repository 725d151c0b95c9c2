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


SAN_OUT = os.path.join(HERE, "libctpu_san.so")


def build(verbose: bool = True, sanitize: bool = False) -> str:
    """``sanitize=True`` builds the ASan+UBSan twin (the Miri analog for
    this runtime, reference CI: test.yaml:97-160); run it via
    ``CTPU_NATIVE_SO=libctpu_san.so LD_PRELOAD=<libasan.so>`` -- see
    tests/test_sanitizer.py."""
    out = SAN_OUT if sanitize else OUT
    cmd = [
        "g++",
        "-O2" if sanitize else "-O3",
        # portable ISA baseline: the .so is built on first import, and a
        # -march=native binary copied between machines can SIGILL
        "-fopenmp",
        "-shared",
        "-fPIC",
        "-std=c++17",
    ]
    if sanitize:
        cmd += [
            "-g",
            "-fsanitize=address,undefined",
            "-fno-sanitize-recover=all",
        ]
    cmd += ["-o", out, SRC]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
