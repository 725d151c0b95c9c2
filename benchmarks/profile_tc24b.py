"""Side-by-side: rANS-64 decode vs TChain-24 decode at identical scale,
plus CTPU_FORCE_INVERSION sweeps for both.  Run on the chip."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from suite import _chain_time
from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops import tchain as tc
from constriction_tpu.ops import pallas_coder64 as pc64
from constriction_tpu.ops.interleaved import LaneConfig
from constriction_tpu.ops.pallas_coder import _pad_stream2d


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = 32768
    R = L // 128
    n = T * L
    rng = np.random.RandomState(1234)
    K = 100
    p = rng.dirichlet(np.full(K, 1.3))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 24)
    cdf = model.cdf
    cfg64 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    symbols = rng.choice(K, size=n, p=p).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)

    forms = [None, "wide", "segmented", "segtree"]

    # --- rANS-64 decode ---
    init_states, stream = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg64
    )
    st = np.asarray(init_states, dtype=np.uint64)
    hi2d = jnp.asarray((st >> np.uint64(32)).astype(np.uint32)).reshape(R, 128)
    lo2d = jnp.asarray((st & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(R, 128)
    w2 = jax.device_put(_pad_stream2d(np.asarray(stream, np.uint32), R))
    for form in forms:
        if form:
            os.environ["CTPU_FORCE_INVERSION"] = form
        else:
            os.environ.pop("CTPU_FORCE_INVERSION", None)
        fn = pc64._build_decoder64.__wrapped__(
            tuple(int(x) for x in cdf), cfg64, T, L, L, False
        )

        def _sdec(h, l, w, fn=fn):
            syms, nh, nl = fn(h, l, w)
            dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
            return h ^ dep, syms[0, 0, 0].astype(jnp.uint32)

        dt = _chain_time(_sdec, (hi2d, lo2d, w2))
        print(f"rans64-dec {str(form):10s} {n / dt / 1e9:7.2f} GB/s  {dt*1e3:7.2f} ms")

    # --- TChain-24 decode ---
    q = rng.randint(0, 1 << 24, size=n).astype(np.uint32)
    qw = jnp.asarray(tc.pack_q24(q, L))
    for form in forms:
        if form:
            os.environ["CTPU_FORCE_INVERSION"] = form
        else:
            os.environ.pop("CTPU_FORCE_INVERSION", None)
        fn = tc._build_tchain24_decoder.__wrapped__(
            tuple(int(x) for x in cdf), T, L, False
        )

        def _tdec(qw_, fn=fn):
            syms, _buf, _hh, hl, _end = fn(qw_)
            dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
            return qw_ ^ dep, hl[0, 0]

        dt = _chain_time(_tdec, (qw,))
        print(f"tchain24   {str(form):10s} {n / dt / 1e9:7.2f} GB/s  {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
