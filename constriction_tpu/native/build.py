"""Build the native host codec: `python -m constriction_tpu.native.build`.

Produces ``libctpu.so`` next to ``codec.cpp``.  Uses a plain g++ invocation
(no pybind11 dependency; the Python side binds via ctypes).
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "codec.cpp")
SRC_SURROGATE = os.path.join(HERE, "surrogate.cpp")
OUT = os.path.join(HERE, "libctpu.so")


SAN_OUT = os.path.join(HERE, "libctpu_san.so")


def _simd_flags() -> list[str]:
    """AVX2+FMA flags when the BUILD machine supports them (the .so is
    always built lazily on the machine that runs it -- wheels ship the
    source, not the binary -- so probing the local CPU is sound).  The
    surrogate fast path (codec.cpp fcdf_a) wants hardware fma; exact paths
    are unaffected because -ffp-contract=off forbids new contractions."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = f.read()
        if " avx2" in flags and " fma" in flags:
            return ["-mavx2", "-mfma"]
    except OSError:
        pass
    return []


def build(verbose: bool = True, sanitize: bool = False) -> str:
    """``sanitize=True`` builds the ASan+UBSan twin (the Miri analog for
    this runtime, reference CI: test.yaml:97-160); run it via
    ``CTPU_NATIVE_SO=libctpu_san.so LD_PRELOAD=<libasan.so>`` -- see
    tests/test_sanitizer.py.

    Two translation units with DIFFERENT float semantics:
    - codec.cpp: strict (-ffp-contract=off) -- the bit-exact coder and
      glibc-CDF table paths must not change with ISA flags;
    - surrogate.cpp: -ffast-math -- its only contract is an error bound
      (codec.cpp re-derives every margin-close decision exactly), and
      fast-math is what lets g++ if-convert the float selects so the
      window loops vectorize.
    """
    out = SAN_OUT if sanitize else OUT
    simd = _simd_flags()
    common = ["-fopenmp", "-fPIC", "-std=c++17"]
    san = (
        ["-g", "-fsanitize=address,undefined", "-fno-sanitize-recover=all"]
        if sanitize
        else []
    )
    codec_o = os.path.join(HERE, "codec_san.o" if sanitize else "codec.o")
    surr_o = os.path.join(HERE, "surrogate_san.o" if sanitize else "surrogate.o")
    steps = [
        ["g++", "-O2" if sanitize else "-O3", "-ffp-contract=off", *simd,
         *common, *san, "-c", SRC, "-o", codec_o],
        ["g++", "-O2" if sanitize else "-O3", "-ffast-math", *simd,
         *common, *san, "-c", SRC_SURROGATE, "-o", surr_o],
        ["g++", *common, *san, "-shared", "-o", out, codec_o, surr_o],
    ]
    for cmd in steps:
        if verbose:
            print(" ".join(cmd))
        subprocess.run(cmd, check=True)
    for obj in (codec_o, surr_o):
        try:
            os.remove(obj)
        except OSError:
            pass
    return out


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
