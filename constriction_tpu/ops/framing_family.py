"""Compact v2 container framing for reference-exact per-symbol families.

The grouped exact-family path (ops/exact_family.py, grouped coding at
exact_family.py:1322-1600) ships its L lane states raw -- L*S bits, 12.4%
of the Q.npz benchmark row's information content at L=32768/S=64 -- while
the reference's whole-message overhead is ~0.0015% (stack.rs:891-895,
framing at lib.rs:719-730).  This module applies the SAME v2 framing that
closed that gap for categorical models (ops/framing.py) to the family
path:

- the symbols are core-size-grouped exactly as in
  ``encode_family_exact_grouped`` (shared deterministic ``group_plan``, so
  the decoder reconstructs the order from (means, scales) alone);
- the last ``k_B`` grouped symbols form region B, encoded with a small
  lane count; region B's stream and packed states ride inside region A's
  encoder seeds and are recovered by the decoder for free;
- region A decodes on-device with the tight-cmax segment kernels (the
  plan's segments clipped to region A's grid steps); region B -- a short
  tail that happens to hold the widest-core symbols -- decodes on the host
  oracle, which has no cmax ceiling.

Wire layout and parser are ops/framing.py's (``parse_v2``); only the
region coders differ.  Measured on the Q.npz suite row the total overhead
drops 12.385% -> ~1.3% (the residual is the ~5 bits/lane v2 floor at
n=4.2M symbols; it amortizes with message length).
"""

from __future__ import annotations

import numpy as np

from .interleaved import LaneConfig
from . import exact_family as ef
from . import framing as fr


def _grouped_planes(symbols, means, scales, family, min_sym, max_sym,
                    cfg, max_segments):
    """(perm, segments, cums, probs) in the grouped wire order."""
    symbols = np.asarray(symbols).reshape(-1)
    means = np.asarray(means, np.float64).reshape(-1)
    scales = np.asarray(scales, np.float64).reshape(-1)
    perm, segments = ef.group_plan(
        means, scales, family, min_sym, max_sym, cfg.precision,
        cfg.num_lanes, len(symbols), max_segments,
    )
    cums, probs = ef.exact_ecp(
        symbols[perm], means[perm], scales[perm], family, min_sym, max_sym,
        cfg.precision,
    )
    return perm, segments, cums, probs


def encode_family_v2(
    symbols, means, scales, family: str, min_sym: int, max_sym: int,
    cfg: LaneConfig, max_segments: int = 10,
) -> np.ndarray:
    """Core-size-grouped reference-exact family encode into a compact v2
    container; decode with :func:`decode_family_v2` (same max_segments).

    The coding tables are the host f64 LeakyQuantizer's
    (quantize.rs:525-568) -- the symbol stream is bit-exact with the
    reference's model family; only the interleaved framing differs."""
    if family not in ef._EST_C:
        raise ValueError(
            f"grouped coding supports families {sorted(ef._EST_C)}; use "
            "the ungrouped encode_family_exact instead"
        )
    assert cfg.state_bits == 64 and cfg.word_bits == 32, (
        "family v2 containers ride the wide-table (S=64) grouped kernels"
    )
    _perm, _segs, cums, probs = _grouped_planes(
        symbols, means, scales, family, min_sym, max_sym, cfg, max_segments
    )

    from . import interleaved2 as il2

    def encode_a(n_A, seeds):
        return il2.encode_shared(cums[:n_A], probs[:n_A], cfg, seeds=seeds)

    return fr.frame_planes_v2(cums, probs, cfg, None, encode_a)


def decode_family_v2(
    data, means, scales, family: str, min_sym: int, max_sym: int,
    max_segments: int = 10, interpret: bool | None = None,
    device_tables: bool | None = None,
) -> np.ndarray:
    """Decode an :func:`encode_family_v2` container.

    Region A runs the grouped tight-cmax segment kernels on device
    (pipelined on-device table build when available); region B is
    recovered from region A's final lane states and decoded on the host
    oracle.  Bit-exact twin of the encode side."""
    import jax
    import jax.numpy as jnp

    if family not in ef._EST_C:
        raise ValueError(
            f"grouped coding supports families {sorted(ef._EST_C)}; use "
            "the ungrouped decode_family_exact instead"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = fr.parse_v2(np.asarray(data))
    cfg = p.cfg
    L = cfg.num_lanes
    S, W = cfg.state_bits, cfg.word_bits
    assert S == 64 and W == 32, (
        "family v2 containers ride the wide-table (S=64) grouped kernels"
    )
    n, n_A, k_B = p.n, p.n_A, p.k_B
    if n == 0:
        return np.zeros(0, np.int64)
    means = np.asarray(means, np.float64).reshape(-1)
    scales = np.asarray(scales, np.float64).reshape(-1)
    if len(means) != n or len(scales) != n:
        raise ValueError(
            f"container holds {n} symbols but {len(means)} models given"
        )
    perm, segments = ef.group_plan(
        means, scales, family, min_sym, max_sym, cfg.precision, L, n,
        max_segments,
    )
    m_p, s_p = means[perm], scales[perm]

    # --- region A: grouped segment kernels over its T_A grid steps.
    # Tables for the boundary step's inactive lanes are built from the
    # REAL region-B params sitting at those grid positions (not the pad
    # model), so the full-message plan's segment widths stay valid;
    # the kernels never use inactive lanes' tables.
    T = -(-n // L)
    T_A = -(-n_A // L) if n_A else 0
    R = L // ef.LANES
    pm, ps = ef._pad_params(m_p, s_p, T * L, family, max_sym)
    segs_A = [
        (t0, min(ns, T_A - t0), cm) for t0, ns, cm in segments if t0 < T_A
    ]

    st = np.asarray(p.states_A, dtype=np.uint64)
    hi = jnp.asarray((st >> np.uint64(32)).astype(np.uint32)).reshape(
        R, ef.LANES
    )
    lo = jnp.asarray((st & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(
        R, ef.LANES
    )
    stream2d = ef._pad_stream2d(p.stream_A, R)
    base = jnp.zeros((1,), jnp.int32)
    outs = []
    from .. import native

    if device_tables is None:
        device_tables = (
            not interpret
            and native.LIB is not None
            and max(abs(int(min_sym)), abs(int(max_sym))) <= (1 << 22)
        )
    built_all = None
    if segs_A and device_tables and native.LIB is not None:
        built_all = ef.packed_tables_on_device_batch(
            [(pm[t0 * L: (t0 + ns) * L], ps[t0 * L: (t0 + ns) * L],
              cm, ns) for t0, ns, cm in segs_A],
            family, min_sym, max_sym, cfg.precision, R,
        )
    for i, (t0, nsteps, cmax) in enumerate(segs_A):
        sl = slice(t0 * L, (t0 + nsteps) * L)
        if built_all is not None:
            tabs4, cmax_r = built_all[i]
        else:
            tabs4, cmax_r = ef.packed_tables_device(
                pm[sl], ps[sl], family, min_sym, max_sym, cfg.precision,
                cmax, nsteps, R,
            )
        last = t0 + nsteps == T_A
        tail_s = (n_A - (T_A - 1) * L) if last else L
        fn = ef._build_exact_decoder64_seg(
            int(min_sym), int(max_sym), cfg, nsteps, tail_s, L, cmax_r,
            interpret,
        )
        syms, hi, lo, base = fn(base, hi, lo, jnp.asarray(tabs4), stream2d)
        outs.append(np.asarray(syms).reshape(-1))
    syms_A = (
        np.concatenate(outs)[:n_A] if outs else np.zeros(0, np.int64)
    )

    # --- region B: recover its stream + packed states from region A's
    # final lane states (== the encoder's seeds after a full decode) and
    # run the host oracle on the tail models.
    if k_B:
        fin = (
            np.asarray(hi, np.uint64).reshape(-1) << np.uint64(32)
        ) | np.asarray(lo, np.uint64).reshape(-1)
        payload = fr._payload_from_seeds(fin, cfg)
        stream_B = fr._bits_to_stream(payload, W, p.slen_B)
        sb_bits = p.slen_B * W
        psb = np.concatenate([
            payload[sb_bits: sb_bits + p.psb_in_seed], p.psb_rem
        ])
        cfg_B = LaneConfig(
            num_lanes=p.L_B, word_bits=W, state_bits=S,
            precision=cfg.precision,
        )
        states_B = fr.unpack_states(psb, cfg_B)
        syms_B = ef.decode_family_exact_host(
            states_B, stream_B, m_p[n_A:], s_p[n_A:], family, min_sym,
            max_sym, cfg_B, k_B,
        )
    else:
        syms_B = np.zeros(0, np.int64)

    out = np.empty(n, dtype=np.int64)
    out[perm] = np.concatenate([
        np.asarray(syms_A, np.int64), np.asarray(syms_B, np.int64)
    ])
    return out
