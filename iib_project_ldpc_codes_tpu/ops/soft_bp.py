"""Soft-decision BP for the AWGN channel: min-sum and sum-product.

Behaviour extension over the reference (BEC-only) per BASELINE.json config 3
("AWGN sum-product BP, n=8192, batched Monte Carlo BER/FER curve").  Same
edge-list gather skeleton as the erasure/Gallager kernels; message algebra
is real-valued LLRs, batch in the trailing (lane) dimension, float32.

Messages live as per-socket *contiguous planes* ([dv] x f32[n, B] on the
variable side, [dc] x f32[m, B] on the check side) routed by static
per-socket index tables -- strided [m, dc, B] slicing lowers poorly on
TPU (see ops/erasure_bp.py).

Check update:
  * min-sum: extrinsic |m| and sign via prefix/suffix min / sign-product
    scans (O(dc) instead of the O(dc^2) leave-one-out loop); optional
    normalisation (alpha) and offset (beta) corrections;
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


def _soft_iteration(code: LDPCCode, llr: jax.Array, mcv_planes,
                    routing, method: str, alpha: float, beta: float):
    """One flooding round.

    ``mcv_planes``: dv contiguous planes [n, B] of incoming check
    messages in variable layout (socket-major, avoiding strided [n, dv, B]
    slicing), in the working ``dtype`` (f32 or bf16).  The posterior is
    always accumulated in f32; only the routed messages live in the
    working dtype (where the HBM traffic is).  Returns (new planes,
    posterior f32).
    """
    to_check_idx, to_var_idx = routing
    dv, dc, m, n = code.dv, code.dc, code.m, code.n
    dtype = mcv_planes[0].dtype

    # variable update: extrinsic sum = posterior - own incoming (f32)
    posterior = llr
    for p in mcv_planes:
        posterior = posterior + p.astype(jnp.float32)
    mvc = [jnp.clip(posterior - p.astype(jnp.float32),
                    -_LLR_CLIP, _LLR_CLIP).astype(dtype)
           for p in mcv_planes]

    # route to check side: plane j of the check layout gathers from the
    # stacked variable-socket planes (gather traffic in the working dtype)
    mvc_flat = jnp.stack(mvc).reshape(dv * n, -1)
    rows = [jnp.take(mvc_flat, to_check_idx[j], axis=0).astype(jnp.float32)
            for j in range(dc)]

    if method == "minsum":
        mcv_rows = _check_update_minsum(rows, alpha, beta)
    else:
        mcv_rows = _check_update_sumproduct(rows)

    # route back to variable side (again in the working dtype)
    mcv_flat = jnp.stack([r.astype(dtype) for r in mcv_rows]
                         ).reshape(dc * m, -1)
    new_planes = [jnp.take(mcv_flat, to_var_idx[p], axis=0)
                  for p in range(dv)]
    posterior = llr
    for p in new_planes:
        posterior = posterior + p.astype(jnp.float32)
    return new_planes, posterior


def _soft_routing(code: LDPCCode):
    """Static per-socket routing tables between the two plane layouts."""
    dv, dc, m, n = code.dv, code.dc, code.m, code.n
    # socket-of-edge: p such that var_to_edge[v, p] == e
    soe = jnp.zeros((n * dv,), jnp.int32)
    for p in range(dv):
        soe = soe.at[code.var_to_edge[:, p]].set(p)
    to_check_idx = []
    for j in range(dc):
        e = jnp.arange(m, dtype=jnp.int32) * dc + j
        to_check_idx.append(jnp.take(soe, e) * n + code.chk_to_var[:, j])
    to_var_idx = []
    for p in range(dv):
        e = code.var_to_edge[:, p]
        to_var_idx.append((e % dc) * m + e // dc)
    return to_check_idx, to_var_idx


def _syndrome_ok(code: LDPCCode, hard: jax.Array) -> jax.Array:
    """bool[B]: every check satisfied (sum of participant bits even)."""
    bits = jnp.take(hard.astype(jnp.int32), code.chk_to_var.reshape(-1),
                    axis=0).reshape(code.m, code.dc, -1)
    parity = jnp.sum(bits, axis=1) % 2
    return ~jnp.any(parity, axis=0)


@partial(jax.jit, static_argnames=("max_iters", "method", "alpha", "beta",
                                   "check_every", "msg_dtype"))
def soft_bp_decode(code: LDPCCode, llr: jax.Array, max_iters: int,
                   method: str = "sumproduct", alpha: float = 1.0,
                   beta: float = 0.0, check_every: int = 1,
                   msg_dtype=jnp.float32) -> SoftBPResult:
    """Decode a batch of LLR words; ``llr`` is f32[n, B] channel LLRs
    (positive favours bit 0; ``AWGN.llr`` output).

    Early exit when all trials satisfy every parity check or the iteration
    budget runs out.  ``error_totals`` counts hard-decision errors against
    the all-zero codeword after each round (index 0 = channel decisions).
    ``check_every`` sets the syndrome-check cadence: the check costs a
    third gather per round, so sweeping well above threshold (where few
    batches converge) runs faster at a higher cadence; results are
    unchanged except that early exit happens at the next multiple.

    ``msg_dtype`` sets the *message* precision (default f32).
    ``jnp.bfloat16`` halves the HBM traffic of the routing gathers — the
    dominant cost on TPU — while the posterior and the check-update
    arithmetic stay f32 (bf16's 8 mantissa bits match the 6-8 bit
    quantisation of production min-sum hardware; expect a small BER shift
    near threshold, none away from it).
    """
    llr = jnp.asarray(llr, jnp.float32)
    routing = _soft_routing(code)
    mcv0 = tuple(jnp.zeros(llr.shape, msg_dtype) for _ in range(code.dv))
    hard0 = llr < 0
    count0 = jnp.sum(hard0).astype(jnp.int32)
    errors = jnp.zeros(max_iters + 1, jnp.int32).at[0].set(count0)
    sat0 = _syndrome_ok(code, hard0)

    def cond(carry):
        _, _, _, it, all_sat = carry
        return (it < max_iters) & ~all_sat

    def body(carry):
        mcv, post, errors, it, _ = carry
        mcv, post = _soft_iteration(code, llr, mcv, routing, method,
                                    alpha, beta)
        mcv = tuple(mcv)
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
