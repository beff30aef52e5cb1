"""Roll-based soft-decision BP (min-sum / sum-product / int8) for
quasi-cyclic codes.

The soft counterpart of ops/qc_bp.py: the generic soft decoder's dv+dc
gathers per round (ops/soft_bp.py) become static-shift ``jnp.roll``s of
[Z, B] planes, so the production quantised decoder runs at stream
bandwidth at any block length on the production code structure.

State is the check-resident message array [E_b, Z, B] (one plane per
real base socket, check-major flat rows); the per-round algebra is the generic
kernel's verbatim -- extrinsic min-sum (or tanh-product) with the same
clips, corrections, and saturation, the free syndrome check from the
gathered sign bits, and the same iteration accounting.  For integer
messages (int8/int16) every operation is exact and order-independent,
so the decoder is BIT-IDENTICAL to ``soft_bp_decode(code.expand(), ...)``
(asserted in tests/test_qc.py); float paths agree to roundoff
(addition order differs).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qc import QCLDPCCode
from .qc_bp import _adjacency
from .soft_bp import (_INT8_MAX, _LLR_CLIP, SoftBPResult,
                      _check_update_minsum, _check_update_sumproduct)


def _var_adjacency(code) -> tuple:
    """Per variable block: ((flat state row, shift), ...) tuples.

    Rows index the flat check-resident state in chk_side order (check-
    major, real sockets only) -- the single source of truth is the
    filtered ``_adjacency`` tuples, so regular and irregular bases
    route identically."""
    chk_side, nb = _adjacency(code)
    var_side = [[] for _ in range(nb)]
    row = 0
    for sockets in chk_side:
        for b, s in sockets:
            var_side[b].append((row, s))
            row += 1
    return tuple(tuple(v) for v in var_side)


def _row_offsets(chk_side) -> tuple:
    """Flat state-row offset of each base check's first socket."""
    off, t = [], 0
    for sockets in chk_side:
        off.append(t)
        t += len(sockets)
    return tuple(off), t


def _qc_posterior(llr0, mcv, var_side, acc_dtype):
    """[nb, Z, B] posterior = llr + sum of rolled incoming messages."""
    posts = []
    for j, sockets in enumerate(var_side):
        post = llr0[j].astype(acc_dtype)
        for row, s in sockets:
            post = post + jnp.roll(mcv[row], s, axis=0).astype(acc_dtype)
        posts.append(post)
    return jnp.stack(posts)


def _qc_soft_iteration(chk_side, var_side, llr0, mcv, method, alpha,
                       beta, acc_dtype, quantised):
    """One flooding round; mirrors ops/soft_bp._soft_iteration."""
    off, _ = _row_offsets(chk_side)
    dtype = mcv.dtype
    post = _qc_posterior(llr0, mcv, var_side, acc_dtype)
    if quantised:
        pm = jnp.clip(post, -_INT8_MAX, _INT8_MAX).astype(dtype)
    else:
        pm = post.astype(dtype)

    new_rows = []
    sat = None
    for c, sockets in enumerate(chk_side):
        rows_c = [jnp.roll(pm[b], -s, axis=0) for b, s in sockets]
        parity = rows_c[0] < 0
        for r in rows_c[1:]:
            parity = parity ^ (r < 0)
        ok = ~jnp.any(parity, axis=0)
        sat = ok if sat is None else (sat & ok)
        rows = [rows_c[jj].astype(acc_dtype) - mcv[off[c] + jj]
                .astype(acc_dtype) for jj in range(len(sockets))]
        if quantised:
            upd = _check_update_minsum(rows, alpha, beta,
                                       mag_cap=_INT8_MAX)
        else:
            rows = [jnp.clip(r, -_LLR_CLIP, _LLR_CLIP) for r in rows]
            if method == "minsum":
                upd = _check_update_minsum(rows, alpha, beta)
            else:
                upd = _check_update_sumproduct(rows)
        new_rows.extend(r.astype(dtype) for r in upd)
    return jnp.stack(new_rows), post, sat


@partial(jax.jit, static_argnames=("chk_side", "var_side", "max_iters",
                                   "method", "alpha", "beta",
                                   "msg_dtype", "int8_scale"))
def _qc_soft_core(llr, chk_side, var_side, max_iters, method, alpha,
                  beta, msg_dtype, int8_scale) -> SoftBPResult:
    nb = len(var_side)
    _, total_rows = _row_offsets(chk_side)
    n, B = llr.shape
    Z = n // nb
    llr_b = jnp.asarray(llr, jnp.float32).reshape(nb, Z, B)
    quantised = jnp.dtype(msg_dtype) == jnp.int8
    if quantised and method != "minsum":
        raise ValueError("int8 messages require method='minsum'")
    if quantised and (alpha != 1.0 or beta != 0.0):
        # same loud contract as the generic decoder (ops/soft_bp.py):
        # saturation replaces the corrections; silently mixing float
        # alpha/beta into int16 planes would break the bit-identity
        # guarantee without failing
        raise ValueError("int8 min-sum: saturation replaces alpha/beta "
                         "corrections")
    if quantised:
        acc_dtype = jnp.int16
        llr0 = jnp.clip(jnp.round(llr_b * int8_scale), -_INT8_MAX,
                        _INT8_MAX).astype(jnp.int8)
    else:
        acc_dtype = jnp.float32
        llr0 = llr_b

    from .bitops import with_vma_of

    # carries must carry llr's varying-manual-axes type under shard_map
    # (jax 0.9 while_loop does not promote; same re-tag as the generic
    # decoder, ops/soft_bp.py)
    mcv0 = with_vma_of(jnp.zeros((total_rows, Z, B), msg_dtype),
                       llr0)
    count0 = jnp.sum(llr_b < 0).astype(jnp.int32)
    errors = jnp.zeros(max_iters + 1, jnp.int32).at[0].set(count0)

    def cond(carry):
        _, _, it, all_sat = carry
        return (it < max_iters) & ~all_sat

    def body(carry):
        mcv, errors, it, _ = carry
        mcv, post_prev, sat_prev = _qc_soft_iteration(
            chk_side, var_side, llr0, mcv, method, alpha, beta,
            acc_dtype, quantised)
        errors = errors.at[it].set(
            jnp.sum(post_prev < 0).astype(jnp.int32))
        return (mcv, errors, it + 1, jnp.all(sat_prev))

    mcv, errors, it, _ = jax.lax.while_loop(
        cond, body,
        (mcv0, errors, jnp.int32(0),
         with_vma_of(jnp.asarray(False), llr0)))

    post = _qc_posterior(llr0, mcv, var_side, acc_dtype)
    decisions = post < 0
    final = jnp.sum(decisions).astype(jnp.int32)
    tail = jnp.arange(max_iters + 1) >= it
    errors = jnp.where(tail, final, errors)
    post_f32 = post.astype(jnp.float32)
    if quantised:
        post_f32 = post_f32 / int8_scale
    # decision-space syndrome of the FINAL posterior (cf. _syndrome_ok)
    hard = decisions.reshape(n, B)
    sat = None
    for sockets in chk_side:
        rows = [jnp.roll(decisions[b], -s, axis=0) for b, s in sockets]
        parity = rows[0]
        for r in rows[1:]:
            parity = parity ^ r
        ok = ~jnp.any(parity, axis=0)
        sat = ok if sat is None else (sat & ok)
    return SoftBPResult(hard=hard, posterior=post_f32.reshape(n, B),
                        satisfied=sat, error_totals=errors,
                        iterations=it)


def qc_soft_bp_decode(code: QCLDPCCode, llr: jax.Array, max_iters: int,
                      method: str = "sumproduct", alpha: float = 1.0,
                      beta: float = 0.0, msg_dtype=jnp.float32,
                      int8_scale: float = 4.0) -> SoftBPResult:
    """Roll-based :func:`..ops.soft_bp.soft_bp_decode` for a QC code.

    ``llr`` is f32[n, B] in the expanded layout (v = j*Z + z).
    All-zero-transmit error accounting (the Monte Carlo convention);
    int8/int16 paths are bit-identical to the generic decoder on
    ``code.expand()``, float paths agree to roundoff.
    """
    chk_side, _ = _adjacency(code)
    var_side = _var_adjacency(code)
    if isinstance(msg_dtype, str):
        msg_dtype = jnp.dtype(msg_dtype)
    return _qc_soft_core(llr, chk_side, var_side, max_iters, method,
                         alpha, beta,
                         jax.dtypes.canonicalize_dtype(msg_dtype),
                         int8_scale)
