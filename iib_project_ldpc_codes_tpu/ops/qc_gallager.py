"""Roll-based Gallager-A/B (BSC hard-decision) for quasi-cyclic codes.

Completes the QC fast-path matrix (BEC: ops/qc_bp.py; soft:
ops/qc_soft_bp.py): the generic decoder's per-socket gathers
(ops/gallager.py) become static-shift rolls of packed [Z, W] bit
planes.  All message algebra is bitwise (XOR extrinsics, bit-sliced
disagree counting), so the decoder is BIT-IDENTICAL to
``gallager_decode_packed(code.expand(), ...)`` -- including the
message-fixed-point termination, which compares the same message SET
laid out differently.  The shared loop scaffold `_gallager_loop`
provides the termination/record/tx accounting verbatim.

No per-iteration ``schedule`` support (the optimal-switching study runs
on the generic kernel); ``threshold`` and per-trial ``record`` work as
in the generic API.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.qc import QCLDPCCode
from .gallager import GallagerResult, _bitsliced_count_ge, _gallager_loop
from .qc_bp import _adjacency
from .qc_soft_bp import _row_offsets, _var_adjacency


@partial(jax.jit, static_argnames=("chk_side", "var_side", "max_iters",
                                   "threshold", "record", "clamped"))
def _qc_gallager_core(received, tx_bits, chk_side, var_side, max_iters,
                      threshold, record, clamped) -> GallagerResult:
    nb = len(var_side)
    n, W = received.shape
    Z = n // nb
    channel = received.reshape(nb, Z, W)
    off, _ = _row_offsets(chk_side)
    # flip rules by CODE TYPE (not inferred from the realized degree
    # multiset -- a degree-uniform irregular base must still clamp like
    # gallager_decode_packed_irregular, or an explicit threshold > d-1
    # silently diverges from the expand() path): regular bases match
    # gallager_decode_packed verbatim (raw threshold); irregular bases
    # match the generic irregular per-degree clamp.
    if not clamped:
        t_of = lambda d: (d - 1) if threshold is None else threshold
    elif threshold is None:
        t_of = lambda d: max(d - 1, 1)
    else:
        t_of = lambda d: min(threshold, max(d - 1, 1))

    def step(mvc, it):
        # check extrinsic XOR per base check (check frame)
        mcv = [None] * mvc.shape[0]
        for c, sockets in enumerate(chk_side):
            planes = [mvc[off[c] + jj] for jj in range(len(sockets))]
            pre = [jnp.zeros_like(planes[0])]
            for p in planes[:-1]:
                pre.append(pre[-1] ^ p)
            suf = [jnp.zeros_like(planes[0])]
            for p in planes[:0:-1]:
                suf.append(suf[-1] ^ p)
            suf.reverse()
            for jj in range(len(sockets)):
                mcv[off[c] + jj] = pre[jj] ^ suf[jj]

        # variable side: disagree planes in the variable frame
        new_mvc = [None] * len(mcv)
        dec_blocks = []
        for b, sockets in enumerate(var_side):
            d = len(sockets)
            disagree = [jnp.roll(mcv[row], s, axis=0) ^ channel[b]
                        for row, s in sockets]
            for p, (row, s) in enumerate(sockets):
                others = [disagree[l] for l in range(d) if l != p]
                if others:
                    flip = _bitsliced_count_ge(others, t_of(d))
                else:
                    # degree-1 block (5G-NR parity-extension columns):
                    # no extrinsic input, never flip (the generic
                    # irregular rule for d-1 = 0 maskable counts)
                    flip = jnp.zeros_like(channel[b])
                out = channel[b] ^ flip
                new_mvc[row] = jnp.roll(out, -s, axis=0)
            dec_flip = _bitsliced_count_ge(disagree, d // 2 + 1)
            dec_blocks.append(channel[b] ^ dec_flip)

        new_mvc = jnp.stack(new_mvc)
        decided = jnp.stack(dec_blocks).reshape(n, W)
        changed = jnp.sum(jnp.not_equal(new_mvc, mvc)) > 0
        return new_mvc, decided, changed

    # initial messages: the channel bit at every socket, in check frame
    mvc0 = jnp.stack([jnp.roll(channel[b], -s, axis=0)
                      for sockets in chk_side for b, s in sockets])
    return _gallager_loop(mvc0, received, step, max_iters, record,
                          tx_bits)


def qc_gallager_decode_packed(code: QCLDPCCode, received: jax.Array,
                              max_iters: int,
                              threshold: int | None = None,
                              record: str = "total",
                              tx_bits: jax.Array | None = None
                              ) -> GallagerResult:
    """Roll-based :func:`..ops.gallager.gallager_decode_packed` for a
    QC code; ``received`` is uint32[n, W] packed hard-bit planes in the
    expanded layout.  Bit-identical results (tests/test_qc.py): regular
    bases (QCLDPCCode) follow gallager_decode_packed's raw-threshold
    rule; irregular bases (IrregularQCLDPCCode) follow
    gallager_decode_packed_irregular's per-degree clamp."""
    from ..models.qc import IrregularQCLDPCCode

    chk_side, _ = _adjacency(code)
    var_side = _var_adjacency(code)
    return _qc_gallager_core(received, tx_bits, chk_side, var_side,
                             max_iters, threshold, record,
                             isinstance(code, IrregularQCLDPCCode))
