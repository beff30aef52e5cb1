"""Roll-based packed BEC BP for quasi-cyclic codes (models/qc.py).

The generic packed decoder's per-edge gathers are the huge-n bottleneck
(gather-locality-bound at n=1e6; relabeling provably can't fix it --
random graphs are expanders).  A QC code's edges are circulants, so
every gather becomes ``jnp.roll`` over the lift axis -- with a STATIC
shift, which XLA lowers to two contiguous slices + concat: pure stream
traffic at any block length.

Semantics are bit-identical to running the generic kernels on
``code.expand()`` (asserted in tests/test_qc.py): same iteration rule,
same fixed-point termination, same error-trajectory tails.  State is
[nb, Z, W] -- block j's plane is the contiguous [Z, W] slab of the
expanded [n, W] layout (v = j*Z + z), so inputs/outputs interop with
every existing channel/counter utility via a reshape.

The base graph is part of the compiled program: the adjacency (base
edges + shifts) is passed to the jitted core as hashable static tuples,
and the base-graph loops unroll at trace time (mb*dcb rolls per round).
Base graphs are protograph-sized (nb <= ~48), so the unrolled HLO stays
small while the lift size Z carries the block length.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qc import QCLDPCCode
from .bitops import total_popcount
from .erasure_bp import (PackedBPResult, _check_packed_batch_bits,
                         _run_to_fixed_point)


def _adjacency(code) -> Tuple[tuple, tuple]:
    """Hashable static routing: per base check its ((block, shift), ...)
    REAL sockets, and the variable-block count (the jitted cores key
    their compilation cache on these tuples).

    Accepts regular (QCLDPCCode) and irregular (IrregularQCLDPCCode)
    bases: padded sockets (sentinel block index == nb) are filtered out
    here, so the roll kernels need no phantom machinery -- every lifted
    check runs at its real degree (the per-row loops below are already
    length-agnostic)."""
    base = np.asarray(code.base_chk)
    sh = np.asarray(code.shifts)
    mb, dcb = base.shape
    chk_side = tuple(
        tuple((int(base[c, j]), int(sh[c, j])) for j in range(dcb)
              if base[c, j] < code.nb)
        for c in range(mb))
    for c, sockets in enumerate(chk_side):
        if not sockets:
            # degenerate input (samplers never produce it); the roll
            # kernels index row 0 of each check's socket list
            raise ValueError(f"base check {c} has no real sockets")
    return chk_side, code.nb


def _qc_iteration_allzero(chk_side, nb, known):
    """One BP round on [nb, Z, W] known planes; rolls only.

    Mirrors ops/erasure_bp._check_summaries' exactly-one-unknown rule:
    a check resolves its unique unknown participant iff the other dcb-1
    are known (all-zero transmit -> validity propagation only).
    """
    full = jnp.uint32(0xFFFFFFFF)
    resolved = [jnp.zeros_like(known[0]) for _ in range(nb)]
    for sockets in chk_side:
        kns = [jnp.roll(known[b], -s, axis=0) for b, s in sockets]
        pre = [jnp.full_like(kns[0], full)]
        for kn in kns[:-1]:
            pre.append(pre[-1] & kn)
        suf = [jnp.full_like(kns[0], full)]
        for kn in kns[:0:-1]:
            suf.append(suf[-1] & kn)
        suf.reverse()
        for jj, (b, s) in enumerate(sockets):
            # exactly-one plane for this socket, rolled back to the
            # variable block's frame: z_v = z_c + s
            ex1 = ~kns[jj] & pre[jj] & suf[jj]
            resolved[b] = resolved[b] | jnp.roll(ex1, s, axis=0)
    return known | jnp.stack(resolved)


def _qc_iteration(chk_side, nb, val, known):
    """Full-value round (nonzero transmit): adds the extrinsic-XOR
    adopt planes alongside validity (cf. _packed_iteration)."""
    full = jnp.uint32(0xFFFFFFFF)
    any_ready = [jnp.zeros_like(known[0]) for _ in range(nb)]
    adopt = [jnp.zeros_like(known[0]) for _ in range(nb)]
    for sockets in chk_side:
        kns = [jnp.roll(known[b], -s, axis=0) for b, s in sockets]
        vls = [jnp.roll(val[b], -s, axis=0) for b, s in sockets]
        pre = [jnp.full_like(kns[0], full)]
        for kn in kns[:-1]:
            pre.append(pre[-1] & kn)
        suf = [jnp.full_like(kns[0], full)]
        for kn in kns[:0:-1]:
            suf.append(suf[-1] & kn)
        suf.reverse()
        xor_known = jnp.zeros_like(kns[0])
        for kn, vl in zip(kns, vls):
            xor_known = xor_known ^ (vl & kn)
        for jj, (b, s) in enumerate(sockets):
            ex1 = ~kns[jj] & pre[jj] & suf[jj]
            any_ready[b] = any_ready[b] | jnp.roll(ex1, s, axis=0)
            adopt[b] = adopt[b] | jnp.roll(ex1 & xor_known, s, axis=0)
    any_ready = jnp.stack(any_ready)
    adopt = jnp.stack(adopt)
    new_known = known | any_ready
    new_val = val | (adopt & ~known)
    return new_val, new_known


@partial(jax.jit, static_argnames=("chk_side", "nb", "max_iters"))
def _qc_allzero_core(erased, chk_side, nb, max_iters) -> PackedBPResult:
    Z = erased.shape[0] // nb
    known0 = (~erased).reshape(nb, Z, erased.shape[1])
    known, errors, it = _run_to_fixed_point(
        known0,
        lambda kn: _qc_iteration_allzero(chk_side, nb, kn),
        lambda kn: total_popcount(~kn).astype(jnp.int32), max_iters)
    known = known.reshape(erased.shape)
    return PackedBPResult(val=jnp.zeros_like(known), known=known,
                          error_totals=errors, iterations=it)


@partial(jax.jit, static_argnames=("chk_side", "nb", "max_iters"))
def _qc_full_core(erased, tx_bits, chk_side, nb, max_iters
                  ) -> PackedBPResult:
    Z = erased.shape[0] // nb
    W = erased.shape[1]
    known0 = (~erased).reshape(nb, Z, W)
    val0 = tx_bits.reshape(nb, Z, W) & known0
    (val, known), errors, it = _run_to_fixed_point(
        (val0, known0),
        lambda s: _qc_iteration(chk_side, nb, *s),
        lambda s: total_popcount(~s[1]).astype(jnp.int32), max_iters)
    return PackedBPResult(val=val.reshape(erased.shape),
                          known=known.reshape(erased.shape),
                          error_totals=errors, iterations=it)


def qc_bp_decode_packed_allzero(code: QCLDPCCode, erased: jax.Array,
                                max_iters: int) -> PackedBPResult:
    """All-zero-transmit packed decode of 32*W trials on a QC code.

    ``erased`` is uint32[n, W] in the expanded layout (v = j*Z + z);
    bit-identical statistics to ``bp_decode_packed_allzero(
    code.expand(), erased, max_iters)`` at roll (stream) bandwidth
    instead of gather bandwidth.
    """
    _check_packed_batch_bits(code.n, erased.shape[1])
    chk_side, nb = _adjacency(code)
    return _qc_allzero_core(erased, chk_side, nb, max_iters)


def qc_bp_decode_packed(code: QCLDPCCode, erased: jax.Array,
                        tx_bits: jax.Array, max_iters: int
                        ) -> PackedBPResult:
    """Nonzero-transmit variant (cf. bp_decode_packed), roll-based."""
    _check_packed_batch_bits(code.n, erased.shape[1])
    chk_side, nb = _adjacency(code)
    return _qc_full_core(erased, tx_bits, chk_side, nb, max_iters)
