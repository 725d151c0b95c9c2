"""Isolate the TChain-24 decode kernel's per-stage cost on a real chip.

Builds stripped kernel variants (same grid/IO, stages knocked out one at a
time) and times them with the chained-jit differencing trick, so the stage
costs can be read off by subtraction:

  full        = unpack + invert + mul40x25 + emit
  no_emit     = full - emission machinery (ranks + butterfly + image DMA)
  no_invert   = full - _compare_sum_auto (cum/prob become constants)
  no_mul      = full - _mul40x25 (head update becomes xor)

Run: python benchmarks/profile_tc24.py [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops import tchain as tc
from constriction_tpu.ops.pallas_coder import (
    LANES,
    _emit_words,
    _row_iota,
    _lane_iota,
    _compare_sum_auto,
)


def _variant_kernel(pltpu, pl, *, cdf, T, R, cap_rows,
                    do_invert, do_mul, do_emit):
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
        q = tc._unpack_q24_block(jnp, qw_in[0])
        if do_invert:
            sym, cum, prob = _compare_sum_auto(q, c, 24)
            cum = cum.astype(jnp.uint32)
            prob = prob.astype(jnp.uint32)
        else:
            sym = q.astype(jnp.int32) & 63
            cum = q & np.uint32(0xFFFF00)
            prob = (q & np.uint32(0xFF)) | np.uint32(0x100)
        if do_mul:
            nhi, nlo = _mul40x25(hh, hl, prob)
            qc = q - cum
            nlo = nlo + qc
            nhi = nhi + jnp.where(nlo < qc, np.uint32(1), np.uint32(0))
        else:
            nhi = hh ^ prob
            nlo = hl ^ cum
        m = (nhi >> 8) != 0
        if do_emit:
            vals = jnp.where(m, nlo, np.uint32(0))
            e_new = _emit_words(
                pltpu, pl, stream_out=stream_out, img=img, sem=sem,
                arow_s=arow_s, renorm=m, vals=vals, t=t, T=T, R=R,
            )
        else:
            e_new = arow_s[0] - jnp.sum(jnp.where(m, 1, 0))
            arow_s[0] = e_new
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


def _build(cdf_tuple, T, L, **flags):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _variant_kernel(pltpu, pl, cdf=cdf_tuple, T=T, R=R,
                             cap_rows=cap_rows, **flags)
    RPAD = -(-(R + 1) // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3 * R // 4, LANES), lambda t: (t, 0, 0),
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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = 32768
    n = T * L
    rng = np.random.default_rng(7)
    K = 100
    p = rng.dirichlet(np.full(K, 1.3))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 24)
    cdf = model.cdf
    # quantiles: uniform 24-bit (bits-back input is arbitrary data)
    q = rng.integers(0, 1 << 24, size=n, dtype=np.uint32)
    qw = jnp.asarray(tc.pack_q24(q, L))
    cdf_tuple = tuple(int(x) for x in cdf)

    variants = {
        "full": dict(do_invert=True, do_mul=True, do_emit=True),
        "no_emit": dict(do_invert=True, do_mul=True, do_emit=False),
        "no_invert": dict(do_invert=False, do_mul=True, do_emit=True),
        "no_mul": dict(do_invert=True, do_mul=False, do_emit=True),
        "bare": dict(do_invert=False, do_mul=False, do_emit=False),
    }
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from suite import _chain_time

    for name, flags in variants.items():
        fn = _build(cdf_tuple, T, L, **flags)

        def _step(qw_, fn=fn):
            syms, _buf, _hh, hl, _end = fn(qw_)
            dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
            return qw_ ^ dep, hl[0, 0]

        dt = _chain_time(_step, (qw,))
        print(f"{name:10s}  {n / dt / 1e9:7.2f} GB/s   {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
