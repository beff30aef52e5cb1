"""Soft-decision BP for the AWGN channel: min-sum and sum-product.

Behaviour extension over the reference (BEC-only) per BASELINE.json config 3
("AWGN sum-product BP, n=8192, batched Monte Carlo BER/FER curve").  Same
edge-list gather skeleton as the erasure/Gallager kernels; message algebra
is real-valued LLRs, batch in the trailing (lane) dimension, float32.

Check update:
  * min-sum: extrinsic |m| via the two-min trick (min1/min2 over the row
    instead of the O(dc^2) leave-one-out loop), extrinsic sign via
    sign-product / own sign (XOR of sign bits); optional normalisation
    (alpha) and offset (beta) corrections;
  * sum-product: 2 atanh(prod tanh(m/2)) computed extrinsically with
    prefix/suffix products in tanh space, clipped for stability.

Variable update: total-sum minus own message.  Decision: sign of the
posterior LLR; convergence via the parity-check syndrome of the hard
decisions (early exit when every check of every trial is satisfied),
replacing the BEC-specific erasure-count rules.
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


def _check_update_minsum(rows: jax.Array, alpha: float, beta: float
                         ) -> jax.Array:
    """rows f32[m, dc, B] -> extrinsic messages f32[m, dc, B]."""
    mag = jnp.abs(rows)
    # two-min trick
    min1 = jnp.min(mag, axis=1, keepdims=True)
    idx = jnp.argmin(mag, axis=1)                     # [m, B]
    masked = jnp.where(
        jax.nn.one_hot(idx, rows.shape[1], axis=1, dtype=bool),
        jnp.inf, mag)
    min2 = jnp.min(masked, axis=1, keepdims=True)
    ext_mag = jnp.where(mag == min1, min2, min1)
    # with duplicates of the minimum, extrinsic min is min1 for all sockets
    dup = jnp.sum(mag == min1, axis=1, keepdims=True) > 1
    ext_mag = jnp.where(dup, jnp.minimum(ext_mag, min1), ext_mag)
    if beta:
        ext_mag = jnp.maximum(ext_mag - beta, 0.0)
    if alpha != 1.0:
        ext_mag = alpha * ext_mag

    neg = rows < 0
    total_neg = jnp.sum(neg, axis=1, keepdims=True)
    ext_neg = (total_neg - neg.astype(total_neg.dtype)) % 2 == 1
    return jnp.where(ext_neg, -ext_mag, ext_mag)


def _check_update_sumproduct(rows: jax.Array) -> jax.Array:
    t = jnp.tanh(jnp.clip(rows, -_LLR_CLIP, _LLR_CLIP) / 2.0)
    t = jnp.clip(t, -_TANH_CLIP, _TANH_CLIP)
    dc = rows.shape[1]
    pre = [jnp.ones_like(t[:, 0])]
    for j in range(dc - 1):
        pre.append(pre[-1] * t[:, j])
    suf = [jnp.ones_like(t[:, 0])]
    for j in range(dc - 1, 0, -1):
        suf.append(suf[-1] * t[:, j])
    suf.reverse()
    ext = jnp.stack([pre[j] * suf[j] for j in range(dc)], axis=1)
    ext = jnp.clip(ext, -_TANH_CLIP, _TANH_CLIP)
    return 2.0 * jnp.arctanh(ext)


def _soft_iteration(code: LDPCCode, llr: jax.Array, mcv_by_var: jax.Array,
                    inv_edge: jax.Array, method: str, alpha: float,
                    beta: float):
    """One flooding round.

    ``mcv_by_var`` f32[n, dv, B]: incoming check messages in variable
    layout.  Returns (new mcv_by_var, posterior LLR).
    """
    # variable update: extrinsic sum = posterior - own incoming
    posterior = llr + jnp.sum(mcv_by_var, axis=1)
    mvc_by_var = posterior[:, None, :] - mcv_by_var        # [n, dv, B]
    mvc_by_var = jnp.clip(mvc_by_var, -_LLR_CLIP, _LLR_CLIP)

    # route to edge (check-major) order, then check update
    mvc_e = jnp.take(
        mvc_by_var.reshape(code.n * code.dv, -1), inv_edge, axis=0)
    rows = mvc_e.reshape(code.m, code.dc, -1)
    if method == "minsum":
        mcv_rows = _check_update_minsum(rows, alpha, beta)
    else:
        mcv_rows = _check_update_sumproduct(rows)

    # route back to variable layout
    mcv_by_var = jnp.take(
        mcv_rows.reshape(code.m * code.dc, -1),
        code.var_to_edge.reshape(-1), axis=0
    ).reshape(code.n, code.dv, -1)
    posterior = llr + jnp.sum(mcv_by_var, axis=1)
    return mcv_by_var, posterior


def _syndrome_ok(code: LDPCCode, hard: jax.Array) -> jax.Array:
    """bool[B]: every check satisfied (sum of participant bits even)."""
    bits = jnp.take(hard.astype(jnp.int32), code.chk_to_var.reshape(-1),
                    axis=0).reshape(code.m, code.dc, -1)
    parity = jnp.sum(bits, axis=1) % 2
    return ~jnp.any(parity, axis=0)


def _inverse_edge_perm(code: LDPCCode) -> jax.Array:
    inv = jnp.zeros((code.n * code.dv,), jnp.int32)
    return inv.at[code.var_to_edge.reshape(-1)].set(
        jnp.arange(code.n * code.dv, dtype=jnp.int32))


@partial(jax.jit, static_argnames=("max_iters", "method", "alpha", "beta",
                                   "check_every"))
def soft_bp_decode(code: LDPCCode, llr: jax.Array, max_iters: int,
                   method: str = "sumproduct", alpha: float = 1.0,
                   beta: float = 0.0, check_every: int = 1) -> SoftBPResult:
    """Decode a batch of LLR words; ``llr`` is f32[n, B] channel LLRs
    (positive favours bit 0; ``AWGN.llr`` output).

    Early exit when all trials satisfy every parity check or the iteration
    budget runs out.  ``error_totals`` counts hard-decision errors against
    the all-zero codeword after each round (index 0 = channel decisions).
    ``check_every`` sets the syndrome-check cadence: the check costs a
    third gather per round, so sweeping well above threshold (where few
    batches converge) runs faster at a higher cadence; results are
    unchanged except that early exit happens at the next multiple.
    """
    llr = jnp.asarray(llr, jnp.float32)
    inv_edge = _inverse_edge_perm(code)
    mcv0 = jnp.zeros((code.n, code.dv, llr.shape[1]), jnp.float32)
    hard0 = llr < 0
    count0 = jnp.sum(hard0).astype(jnp.int32)
    errors = jnp.zeros(max_iters + 1, jnp.int32).at[0].set(count0)
    sat0 = _syndrome_ok(code, hard0)

    def cond(carry):
        _, _, _, it, all_sat = carry
        return (it < max_iters) & ~all_sat

    def body(carry):
        mcv, post, errors, it, _ = carry
        mcv, post = _soft_iteration(code, llr, mcv, inv_edge, method,
                                    alpha, beta)
        hard = post < 0
        errors = errors.at[it + 1].set(jnp.sum(hard).astype(jnp.int32))
        all_sat = jax.lax.cond(
            (it + 1) % check_every == 0,
            lambda: jnp.all(_syndrome_ok(code, hard)),
            lambda: jnp.asarray(False))
        return (mcv, post, errors, it + 1, all_sat)

    mcv, post, errors, it, _ = jax.lax.while_loop(
        cond, body, (mcv0, llr, errors, jnp.int32(0), jnp.all(sat0)))

    hard = post < 0
    final_count = jnp.sum(hard).astype(jnp.int32)
    tail = jnp.arange(max_iters + 1) > it
    errors = jnp.where(tail, final_count, errors)
    return SoftBPResult(hard=hard, posterior=post,
                        satisfied=_syndrome_ok(code, hard),
                        error_totals=errors, iterations=it)
