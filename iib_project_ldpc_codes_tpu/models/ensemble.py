"""Seeded (dv,dc)-regular configuration-model ensemble sampler.

Reference behaviour (random_code_generator.c:21-67 and its array formulation
random_code_generator_python.py:56-78): shuffle the n*dv socket sequence,
floor-divide by dv to get the variable at each check socket, and reject the
whole draw if any check touches the same variable twice (multi-edge), capped
at 10000 retries.  The reference *ignores its seed argument*
(random_code_generator.c:23 seeds from time(NULL)); here every draw is a pure
function of a ``jax.random`` key, so runs are reproducible.

Two on-device sampling strategies:

  * ``method="reject"`` -- resample the full permutation until simple; the
    exact reference distribution (uniform over simple configurations).
    Acceptance probability decays like exp(-(dv-1)(dc-1)/2), independent of
    n, for fixed degrees -- fine for (3,6) (~ e^-5 per *check*-collision
    model; empirically a few dozen retries at large n).
  * ``method="repair"`` -- resample only the offending rows' sockets by
    swapping duplicated sockets with uniformly random partners until simple.
    O(1) expected passes, asymptotically uniform; the default for large n.

Both run under ``jit`` via ``lax.while_loop`` with a bounded retry count and
a validity flag in the carry (the guaranteed-progress fallback the reference
implements as a 10000-recursion cap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .code import LDPCCode, code_from_checks

MAX_REJECT_TRIES = 10_000  # reference cap, random_code_generator.c:26-28
MAX_REPAIR_PASSES = 1_000


def _row_has_duplicates(chk_to_var: jax.Array) -> jax.Array:
    """bool[m]: does any check socket repeat a variable within its row?"""
    s = jnp.sort(chk_to_var, axis=1)
    return jnp.any(s[:, 1:] == s[:, :-1], axis=1)


def _perm_to_checks(perm: jax.Array, dv: int, dc: int) -> jax.Array:
    """Socket permutation -> check->variable table (configuration model)."""
    return (perm // dv).reshape(-1, dc).astype(jnp.int32)


def _with_key_vma(x: jax.Array, key: jax.Array) -> jax.Array:
    """Re-attach the key's varying-manual-axes type to ``x``.

    jax 0.9.0 bug (verified with jax.typeof under shard_map): sort-derived
    *index* outputs drop the operand's vma -- ``argsort(bits)`` of a
    varying ``bits`` comes back unvarying, and ``jax.random.permutation``
    (argsort of random bits internally) therefore returns an unvarying
    array from a varying key.  Downstream while_loops then fail shard_map's
    check_vma with "carry input int32[E] vs output int32[E]{V:axis}".
    Adding a key-derived zero unions the correct vma back in; XLA folds
    the add away.  No-op outside shard_map (zero vma, zero value).
    """
    zero = jax.random.bits(key, (), jnp.uint32) & jnp.uint32(0)
    return x + zero.astype(x.dtype)


def _sample_reject(key: jax.Array, n: int, dv: int, dc: int) -> jax.Array:
    """Full-permutation rejection sampling (exact reference semantics)."""

    def draw(key):
        key, sub = jax.random.split(key)
        perm = _with_key_vma(jax.random.permutation(sub, n * dv), sub)
        return key, _perm_to_checks(perm, dv, dc)

    def cond(carry):
        _, chk, tries = carry
        return jnp.logical_and(jnp.any(_row_has_duplicates(chk)),
                               tries < MAX_REJECT_TRIES)

    def body(carry):
        key, _, tries = carry
        key, chk = draw(key)
        return key, chk, tries + 1

    key, chk0 = draw(key)
    _, chk, _ = jax.lax.while_loop(cond, body, (key, chk0, jnp.int32(0)))
    return chk


def _sample_repair(key: jax.Array, n: int, dv: int, dc: int) -> jax.Array:
    """Permutation sampling with duplicate-socket repair swaps.

    Each pass: find the first check-row socket that duplicates an earlier
    socket of its row and swap its permutation entry with a uniformly random
    socket anywhere in the sequence.  Swaps preserve the permutation
    property; passes repeat until every row is simple.  The expected
    duplicate count is ~ (dv-1)(dc-1)/2 regardless of n, so the expected
    pass count is O(1).

    One swap per pass (no inner loop): every swap sees a fresh duplicate
    scan, and -- structurally -- a single ``while_loop`` whose state all
    flows through the carry is the formulation jax 0.9.0's shard_map
    varying-manual-axes checker accepts.  A scan/fori_loop nested inside a
    while_loop body fails that checker even when correctly replicated
    (the while fixpoint starts carries as unvarying and the inner loop
    hard-errors on the input/output vma mismatch before the fixpoint can
    promote them -- see tests/test_montecarlo.py::test_check_vma_passes).
    """
    E = n * dv
    key, sub = jax.random.split(key)
    perm = _with_key_vma(jax.random.permutation(sub, E), sub)

    def dup_positions(perm):
        # bool[E] in check-socket layout: socket j of row i duplicates an
        # earlier socket of the same row.
        chk = _perm_to_checks(perm, dv, dc)
        eq = chk[:, :, None] == chk[:, None, :]  # [m, dc, dc]
        tri = jnp.tril(jnp.ones((dc, dc), bool), k=-1)
        return jnp.any(eq & tri, axis=2).reshape(-1)  # [E]

    def cond(carry):
        perm, key, passes = carry
        return jnp.logical_and(jnp.any(dup_positions(perm)),
                               passes < MAX_REPAIR_PASSES)

    def body(carry):
        perm, key, passes = carry
        # cond guarantees a duplicate exists; argmax of the bool mask is its
        # first position.
        i = jnp.argmax(dup_positions(perm)).astype(jnp.int32)
        key, k_pick = jax.random.split(key)
        j = jax.random.randint(k_pick, (), 0, E)
        pi, pj = perm[i], perm[j]
        perm = perm.at[i].set(pj).at[j].set(pi)
        return perm, key, passes + 1

    perm, _, _ = jax.lax.while_loop(cond, body, (perm, key, jnp.int32(0)))
    return _perm_to_checks(perm, dv, dc)


@partial(jax.jit, static_argnames=("n", "dv", "dc", "method"))
def sample_check_table(key: jax.Array, n: int, dv: int, dc: int,
                       method: str = "repair") -> jax.Array:
    """Sample a simple (dv,dc)-regular check->variable table, int32[m, dc]."""
    if (n * dv) % dc != 0:
        raise ValueError("n*dv must be divisible by dc")
    if method == "reject":
        return _sample_reject(key, n, dv, dc)
    elif method == "repair":
        return _sample_repair(key, n, dv, dc)
    raise ValueError(f"unknown sampling method {method!r}")


def sample_code(key: jax.Array, n: int, dv: int, dc: int,
                method: str = "repair") -> LDPCCode:
    """Sample one code from the (dv,dc)-regular ensemble."""
    chk = sample_check_table(key, n, dv, dc, method)
    return code_from_checks(chk, n=n, dv=dv, dc=dc)


@partial(jax.jit, static_argnames=("num", "n", "dv", "dc", "method"))
def sample_codes(key: jax.Array, num: int, n: int, dv: int, dc: int,
                 method: str = "repair") -> LDPCCode:
    """Sample a batch of codes; arrays gain a leading [num] axis.

    The batched result is still an :class:`LDPCCode` pytree, suitable for
    ``vmap``-ed decoding (fresh-code-per-trial Monte Carlo, the reference's
    mode 0, parallel_simulator.py:198-244).
    """
    keys = jax.random.split(key, num)
    chk = jax.vmap(lambda k: sample_check_table(k, n, dv, dc, method))(keys)
    build = jax.vmap(lambda c: code_from_checks(c, n=n, dv=dv, dc=dc))
    return build(chk)


def code_for_config(cfg):
    """Deterministic fixed code keyed by (code_number, n, degrees).

    The replacement for the reference's ``.npy`` parity-check cache
    (parallel_simulator.py:289-335): regenerating from the key is exact,
    so nothing needs to be stored -- and every process of a multi-host
    job derives the *same* code without any broadcast.  Irregular configs
    (cfg.lam/rho set) fold a hash of the degree distributions in and
    return an :class:`..models.irregular.IrregularLDPCCode`.
    """
    import jax

    if getattr(cfg, "lam", None) is not None:
        from .irregular import IrregularEnsembleSpec

        fold = hash((tuple(cfg.lam), tuple(cfg.rho))) & 0x7FFFFFFF
        code_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
            fold)
        spec = IrregularEnsembleSpec.from_lam_rho(cfg.n, cfg.lam, cfg.rho)
        return spec.sample(code_key, cfg.sampler)

    code_key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
        cfg.dv * 1000 + cfg.dc)
    return sample_code(code_key, cfg.n, cfg.dv, cfg.dc, cfg.sampler)
