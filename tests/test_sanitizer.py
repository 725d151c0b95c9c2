"""ASan/UBSan gate for the C++ host runtime (the Miri analog).

The reference runs its full unit-test suite under Miri to validate every
unsafe block (reference CI: .github/workflows/test.yaml:97-160).  codec.cpp
uses raw pointers and OpenMP; this test builds it with
``-fsanitize=address,undefined -fno-sanitize-recover=all`` and drives every
exported entry point through the Python bindings in a subprocess with the
ASan runtime preloaded.  Any heap overflow / UB aborts the subprocess.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

EXERCISE = r"""
import sys
sys.path.insert(0, %(root)r)
import numpy as np
from constriction_tpu import native
assert native.available(), "sanitized native lib failed to load"
from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops.interleaved import LaneConfig
import constriction_tpu as constriction

rng = np.random.RandomState(0)

# ILANS2 encode/decode (+ range twin) through the native fast paths
for K, P in ((60, 12), (700, 14)):
    probs = rng.dirichlet(np.full(K, 1.0))
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    m = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, P)
    cdf = m.cdf
    syms = rng.choice(K, size=4321, p=probs).astype(np.int64)
    for L in (8, 256):
        cfg = LaneConfig(L, 16, 32, P)
        cont = il2.encode_iid_categorical2(syms, cdf, cfg)
        out = il2.decode_iid_categorical2(cont, cdf)
        assert np.array_equal(out, syms)
        pts, sw = il2.encode_iid_categorical_range(syms, cdf, cfg)
        out = il2.decode_shared_range_cdf(pts, sw, len(syms), cdf, cfg)
        assert np.array_equal(out, syms)

# DEFAULT-preset (S=64) native paths: u64-pair state/point output, the
# CDF-binary-search decode, and the wide (P=24) exact boundary tables
from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel as _CC,
)
probs24 = rng.dirichlet(np.full(90, 1.0))
cdf24 = _CC.from_floating_point_probabilities_fast(probs24, 24).cdf
syms24 = rng.choice(90, size=3000, p=probs24).astype(np.int64)
cdf24_64 = cdf24.astype(np.uint64)
cfg64 = LaneConfig(128, 32, 64, 24)
st64, w64 = il2.encode_shared(
    cdf24_64[syms24], cdf24_64[syms24 + 1] - cdf24_64[syms24], cfg64
)
assert st64.dtype == np.uint64
out64 = il2.decode_shared_cdf(st64, w64, len(syms24), cdf24, cfg64)
assert np.array_equal(out64, syms24)
rp64, rw64 = il2.encode_shared_range(
    cdf24_64[syms24], cdf24_64[syms24 + 1] - cdf24_64[syms24], cfg64
)
out64r = il2.decode_shared_range_cdf(rp64, rw64, len(syms24), cdf24, cfg64)
assert np.array_equal(out64r, syms24)
from constriction_tpu.ops import exact_family as _ef
_aux, _core = _ef.exact_boundary_tables(
    rng.uniform(-80, 80, 500), rng.uniform(0.1, 6.0, 500),
    "gaussian", -100, 100, 24, 202,
)

# scalar coders + quantized families (ctpu_quantized_ecp, ans/range/chain)
fam = constriction.stream.model.QuantizedGaussian(-100, 100)
means = rng.uniform(-80, 80, 200)
stds = rng.uniform(0.3, 40, 200)
syms = np.clip(np.round(means + rng.randn(200) * stds), -100, 100).astype(np.int32)
enc = constriction.stream.stack.AnsCoder()
enc.encode_reverse(syms, fam, means, stds)
dec = constriction.stream.stack.AnsCoder(enc.get_compressed())
assert np.array_equal(dec.decode(fam, means, stds), syms)
renc = constriction.stream.queue.RangeEncoder()
renc.encode(syms, fam, means, stds)
rdec = renc.get_decoder()
assert np.array_equal(rdec.decode(fam, means, stds), syms)
data = rng.randint(0, 1 << 32, size=64, dtype=np.uint32)
cc = constriction.stream.chain.ChainCoder(data, seal=True)
cat = constriction.stream.model.Categorical(
    rng.dirichlet(np.full(30, 1.0)), perfect=False)
s = cc.decode(cat, 40)
prefix, suffix = cc.get_remainders()
cc2 = constriction.stream.chain.ChainCoder(suffix, is_remainders=True)
cc2.encode_reverse(s, cat)

# v2 framing: ctpu_ilans2_encode_seeded + the decoders' final-state
# writebacks + the coded-widths AnsCoder pass, all through native
from constriction_tpu.ops import framing as _fr
_m12 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
    rng.dirichlet(np.full(50, 1.0)), 12)
_s12 = rng.choice(50, size=20000,
                  p=np.diff(_m12.cdf.astype(np.float64)) / 4096).astype(np.int64)
_cfgf = LaneConfig(num_lanes=256, word_bits=16, state_bits=32, precision=12)
_c2 = _fr.encode_iid_v2(_s12, _m12.cdf, _cfgf)
assert np.array_equal(_fr.decode_iid_v2(_c2, _m12.cdf), _s12)
print("SANITIZED_RUN_OK")
"""


def _libasan() -> str:
    try:
        p = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return p if os.path.isabs(p) and os.path.exists(p) else ""
    except Exception:
        return ""


def test_native_runtime_under_asan_ubsan():
    libasan = _libasan()
    if not libasan:
        pytest.skip("libasan not available")
    sys.path.insert(0, ROOT)
    from constriction_tpu.native import build as nb

    src_m = os.path.getmtime(nb.SRC)
    if not os.path.exists(nb.SAN_OUT) or os.path.getmtime(nb.SAN_OUT) < src_m:
        nb.build(verbose=False, sanitize=True)

    env = dict(os.environ)
    env.update(
        CTPU_NATIVE_SO=nb.SAN_OUT,
        CTPU_NATIVE="1",
        LD_PRELOAD=libasan,
        # leak checking flags the Python interpreter itself; UB/overflow
        # detection (the Miri analog) stays on
        ASAN_OPTIONS="detect_leaks=0,abort_on_error=1",
        UBSAN_OPTIONS="halt_on_error=1",
        JAX_PLATFORMS="cpu",
    )
    p = subprocess.run(
        [sys.executable, "-c", EXERCISE % {"root": ROOT}],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=480,
    )
    out = p.stdout + p.stderr
    assert p.returncode == 0, f"sanitized run failed:\n{out[-4000:]}"
    assert "SANITIZED_RUN_OK" in out, out[-4000:]
