"""TChain-24 decode structural A/B: packed-q24 input vs raw u32 tiles vs
no-input (q synthesized from lane index) -- isolates the input-path cost.
Variants are built once, then timed interleaved over several rounds so
shared-chip drift hits all variants equally."""

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
from constriction_tpu.ops import tchain as tc
from constriction_tpu.ops.pallas_coder import (
    LANES,
    _compare_sum_auto,
    _emit_words,
    _lane_iota,
    _row_iota,
)


def _variant_kernel(pltpu, pl, *, cdf, T, R, cap_rows, qmode):
    from constriction_tpu.ops.pallas_coder64 import _mul40x25

    c = np.asarray(cdf).astype(np.int64)

    def kernel(qw_in, syms_out, stream_out, hh_out, hl_out, end_out,
               hh_s, hl_s, img, arow_s, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            hh_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            hl_s[:] = jnp.full((R, LANES), np.uint32(256), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        hh, hl = hh_s[:], hl_s[:]
        if qmode == "packed":
            q = tc._unpack_q24_block(jnp, qw_in[0])
        elif qmode == "raw":
            q = qw_in[0]
        else:  # synth: cheap per-step value, no input dependency
            lane_flat = (_row_iota(R) * LANES + _lane_iota(R)).astype(jnp.uint32)
            q = (lane_flat * np.uint32(2654435761)
                 + t.astype(jnp.uint32)) & np.uint32(0xFFFFFF)
        sym, cum, prob = _compare_sum_auto(q, c, 24)
        cum = cum.astype(jnp.uint32)
        prob = prob.astype(jnp.uint32)
        nhi, nlo = _mul40x25(hh, hl, prob)
        qc = q - cum
        nlo = nlo + qc
        nhi = nhi + jnp.where(nlo < qc, np.uint32(1), np.uint32(0))
        m = (nhi >> 8) != 0
        vals = jnp.where(m, nlo, np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem,
            arow_s=arow_s, renorm=m, vals=vals, t=t, T=T, R=R,
        )
        hh_s[:] = jnp.where(m, np.uint32(0), nhi)
        hl_s[:] = jnp.where(m, nhi, nlo)
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            hh_out[:] = hh_s[:]
            hl_out[:] = hl_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


def _build(cdf_tuple, T, L, qmode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _variant_kernel(pltpu, pl, cdf=cdf_tuple, T=T, R=R,
                             cap_rows=cap_rows, qmode=qmode)
    RPAD = -(-(R + 1) // 8) * 8
    in_rows = 3 * R // 4 if qmode == "packed" else R
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, in_rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )
    return jax.jit(fn)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = 32768
    R = L // 128
    n = T * L
    rng = np.random.RandomState(1234)
    K = 100
    p = rng.dirichlet(np.full(K, 1.3))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 24)
    cdf = model.cdf
    cdf_tuple = tuple(int(x) for x in cdf)
    q = rng.randint(0, 1 << 24, size=n).astype(np.uint32)

    inputs = {
        "packed": jnp.asarray(tc.pack_q24(q, L)),
        "raw": jnp.asarray(q.reshape(T, R, 128)),
        "synth": jnp.asarray(q.reshape(T, R, 128)),
    }
    fns = {m: _build(cdf_tuple, T, L, m) for m in inputs}
    results = {m: [] for m in inputs}
    for rnd in range(3):
        for m, fn in fns.items():
            def _tdec(qw_, fn=fn):
                syms, _buf, _hh, hl, _end = fn(qw_)
                dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
                return qw_ ^ dep, hl[0, 0]

            dt = _chain_time(_tdec, (inputs[m],))
            results[m].append(n / dt / 1e9)
    for m, v in results.items():
        print(f"{m:8s} " + "  ".join(f"{x:6.2f}" for x in v) + " GB/s")


if __name__ == "__main__":
    main()
