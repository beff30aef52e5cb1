"""Soft-decision BP for the AWGN channel: min-sum and sum-product.

Behaviour extension over the reference (BEC-only) per BASELINE.json config 3
("AWGN sum-product BP, n=8192, batched Monte Carlo BER/FER curve").  Same
edge-list gather skeleton as the erasure/Gallager kernels; message algebra
is real-valued LLRs, batch in the trailing (lane) dimension, float32.

The decoder state is *check-resident*: the only persistent message
array is the check->variable messages as dc contiguous planes
[m, B] in the working dtype, plus the f32 posterior [n, B].  Each
round gathers the posterior to the check side (variable->check message
= posterior - own incoming, the extrinsic subtraction done at the
check side), runs the check update in place, and routes the new
check messages back through one static per-socket index table.  This
halves the HBM traffic of the earlier two-sided plane formulation:
variable->check messages are never materialised in variable layout,
and the parity-check syndrome falls out of the sign bits of the
posterior rows the round gathers anyway (no separate syndrome gather).
Strided [m, dc, B] slicing lowers poorly on TPU (see ops/erasure_bp.py),
hence the per-socket contiguous planes.

Check update:
  * min-sum: extrinsic |m| and sign via prefix/suffix min / sign-product
    scans (O(dc) instead of the O(dc^2) leave-one-out loop); optional
    normalisation (alpha) and offset (beta) corrections;
  * sum-product: 2 atanh(prod tanh(m/2)) computed extrinsically with
    prefix/suffix products in tanh space, clipped for stability.

Variable update: total-sum minus own message.  Decision: sign of the
posterior LLR; convergence via the parity-check syndrome (early exit
when every check of every trial is satisfied), replacing the
BEC-specific erasure-count rules.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from ..models.code import LDPCCode

_LLR_CLIP = 30.0
_TANH_CLIP = 0.999999


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SoftBPResult:
    hard: jax.Array          # bool[n, B] hard decisions (True = bit 1)
    posterior: jax.Array     # f32[n, B] posterior LLRs
    satisfied: jax.Array     # bool[B] all checks satisfied
    error_totals: jax.Array  # int32[max_iters+1] decision errors vs all-zero
    iterations: jax.Array

    @property
    def bit_errors(self) -> jax.Array:
        """int32[B] decision errors per trial (all-zero transmit)."""
        return jnp.sum(self.hard, axis=0).astype(jnp.int32)

    @property
    def failed(self) -> jax.Array:
        """bool[B]: any decision error (all-zero transmit)."""
        return jnp.any(self.hard, axis=0)


def _check_update_minsum(planes, alpha: float, beta: float):
    """dc contiguous planes f32[m, B] -> dc extrinsic planes.

    Extrinsic |m| via prefix/suffix mins (no one-hot two-min bookkeeping
    needed in plane form), extrinsic sign via prefix/suffix sign products.
    """
    dc = len(planes)
    mags = [jnp.abs(p) for p in planes]
    sgns = [jnp.signbit(p) for p in planes]
    inf = jnp.full_like(planes[0], jnp.inf)
    pre_m, suf_m = [inf], [inf]
    pre_s = [jnp.zeros_like(sgns[0])]
    suf_s = [jnp.zeros_like(sgns[0])]
    for j in range(dc - 1):
        pre_m.append(jnp.minimum(pre_m[-1], mags[j]))
        pre_s.append(pre_s[-1] ^ sgns[j])
    for j in range(dc - 1, 0, -1):
        suf_m.append(jnp.minimum(suf_m[-1], mags[j]))
        suf_s.append(suf_s[-1] ^ sgns[j])
    suf_m.reverse()
    suf_s.reverse()
    out = []
    for j in range(dc):
        mag = jnp.minimum(pre_m[j], suf_m[j])
        if beta:
            mag = jnp.maximum(mag - beta, 0.0)
        if alpha != 1.0:
            mag = alpha * mag
        out.append(jnp.where(pre_s[j] ^ suf_s[j], -mag, mag))
    return out


def _check_update_sumproduct(planes):
    dc = len(planes)
    ts = [jnp.clip(jnp.tanh(jnp.clip(p, -_LLR_CLIP, _LLR_CLIP) / 2.0),
                   -_TANH_CLIP, _TANH_CLIP) for p in planes]
    one = jnp.ones_like(ts[0])
    pre, suf = [one], [one]
    for j in range(dc - 1):
        pre.append(pre[-1] * ts[j])
    for j in range(dc - 1, 0, -1):
        suf.append(suf[-1] * ts[j])
    suf.reverse()
    return [2.0 * jnp.arctanh(jnp.clip(pre[j] * suf[j], -_TANH_CLIP,
                                       _TANH_CLIP))
            for j in range(dc)]


def _soft_iteration(code: LDPCCode, llr: jax.Array, mcv_rows,
                    to_var_idx, method: str, alpha: float, beta: float):
    """One flooding round over check-resident state.

    ``mcv_rows``: dc contiguous planes [m, B] of check->variable
    messages in check layout, in the working ``dtype`` (f32 or bf16);
    ``llr`` the f32 channel LLRs.  The posterior is reconstructed from
    the incoming messages (llr + sum), cast once to the working dtype,
    and gathered to the check side, where the extrinsic subtraction
    (posterior - own incoming) happens in f32 — variable->check
    messages never touch HBM in variable layout.  Returns
    (new mcv planes, posterior f32, entering-posterior syndrome ok
    bool[B]).
    """
    dv, dc = code.dv, code.dc
    dtype = mcv_rows[0].dtype

    # variable update: posterior = llr + sum of incoming (dv gathers
    # from the stacked check planes, traffic in the working dtype)
    mcv_flat = jnp.stack(mcv_rows).reshape(dc * code.m, -1)
    posterior = llr
    for p in range(dv):
        posterior = posterior + jnp.take(
            mcv_flat, to_var_idx[p], axis=0).astype(jnp.float32)

    # route the posterior to the check side (working dtype); the
    # syndrome of this posterior falls out of the gathered sign bits
    post_msg = posterior.astype(dtype)
    post_rows = [jnp.take(post_msg, code.chk_to_var[:, j], axis=0)
                 for j in range(dc)]
    parity = post_rows[0] < 0
    for j in range(1, dc):
        parity = parity ^ (post_rows[j] < 0)
    sat = ~jnp.any(parity, axis=0)

    # extrinsic subtraction at the check side + check update (f32 math)
    rows = [jnp.clip(post_rows[j].astype(jnp.float32)
                     - mcv_rows[j].astype(jnp.float32),
                     -_LLR_CLIP, _LLR_CLIP) for j in range(dc)]
    if method == "minsum":
        new_rows = _check_update_minsum(rows, alpha, beta)
    else:
        new_rows = _check_update_sumproduct(rows)
    return [r.astype(dtype) for r in new_rows], posterior, sat


def _soft_routing(code: LDPCCode):
    """Static per-socket table: variable socket p -> flat check-plane row.

    ``to_var_idx[p][v]`` indexes the stacked [dc*m, B] check planes at
    the message feeding socket p of variable v (edge e = c*dc + j maps
    to flat row j*m + c).
    """
    dv, dc, m = code.dv, code.dc, code.m
    to_var_idx = []
    for p in range(dv):
        e = code.var_to_edge[:, p]
        to_var_idx.append((e % dc) * m + e // dc)
    return to_var_idx


def _syndrome_ok(code: LDPCCode, hard: jax.Array) -> jax.Array:
    """bool[B]: every check satisfied (sum of participant bits even)."""
    bits = jnp.take(hard.astype(jnp.int32), code.chk_to_var.reshape(-1),
                    axis=0).reshape(code.m, code.dc, -1)
    parity = jnp.sum(bits, axis=1) % 2
    return ~jnp.any(parity, axis=0)


@partial(jax.jit, static_argnames=("max_iters", "method", "alpha", "beta",
                                   "msg_dtype"))
def soft_bp_decode(code: LDPCCode, llr: jax.Array, max_iters: int,
                   method: str = "sumproduct", alpha: float = 1.0,
                   beta: float = 0.0,
                   msg_dtype=jnp.float32) -> SoftBPResult:
    """Decode a batch of LLR words; ``llr`` is f32[n, B] channel LLRs
    (positive favours bit 0; ``AWGN.llr`` output).

    Early exit when all trials satisfy every parity check or the iteration
    budget runs out.  ``error_totals`` counts hard-decision errors against
    the all-zero codeword after each round (index 0 = channel decisions).
    The syndrome is read off the sign bits of the posterior rows each
    round already gathers, so checking is free; convergence of the
    round-``t`` posterior is observed at the top of round ``t+1``
    (``iterations`` counts the check-update rounds actually executed —
    at most one more than the round that converged).

    ``msg_dtype`` sets the *message* precision (default f32).
    ``jnp.bfloat16`` halves the HBM traffic of the routing gathers — the
    dominant cost on TPU — while the posterior and the check-update
    arithmetic stay f32 (bf16's 8 mantissa bits match the 6-8 bit
    quantisation of production min-sum hardware; expect a small BER shift
    near threshold, none away from it).
    """
    llr = jnp.asarray(llr, jnp.float32)
    to_var_idx = _soft_routing(code)
    mcv0 = tuple(jnp.zeros((code.m, llr.shape[1]), msg_dtype)
                 for _ in range(code.dc))
    count0 = jnp.sum(llr < 0).astype(jnp.int32)
    errors = jnp.zeros(max_iters + 1, jnp.int32).at[0].set(count0)

    def cond(carry):
        _, _, it, all_sat = carry
        return (it < max_iters) & ~all_sat

    def body(carry):
        mcv, errors, it, _ = carry
        mcv, post_prev, sat_prev = _soft_iteration(
            code, llr, mcv, to_var_idx, method, alpha, beta)
        # post_prev / sat_prev describe the posterior *entering* this
        # round (after `it` check updates); record its error count.
        errors = errors.at[it].set(
            jnp.sum(post_prev < 0).astype(jnp.int32))
        return (tuple(mcv), errors, it + 1, jnp.all(sat_prev))

    mcv, errors, it, _ = jax.lax.while_loop(
        cond, body, (mcv0, errors, jnp.int32(0), jnp.asarray(False)))

    # reconstruct the final posterior from the check-resident state
    mcv_flat = jnp.stack(mcv).reshape(code.dc * code.m, -1)
    post = llr
    for p in range(code.dv):
        post = post + jnp.take(mcv_flat, to_var_idx[p],
                               axis=0).astype(jnp.float32)
    hard = post < 0
    final_count = jnp.sum(hard).astype(jnp.int32)
    tail = jnp.arange(max_iters + 1) >= it
    errors = jnp.where(tail, final_count, errors)
    return SoftBPResult(hard=hard, posterior=post,
                        satisfied=_syndrome_ok(code, hard),
                        error_totals=errors, iterations=it)
