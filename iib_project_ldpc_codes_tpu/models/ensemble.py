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


def match_until_simple(key: jax.Array, E: int, draw_perm, dup_info,
                       method: str) -> jax.Array:
    """Configuration-model matching loop, shared by the regular and
    irregular samplers (models/irregular.py).

    ``draw_perm(subkey) -> perm`` draws a fresh uniform (vma-re-tagged)
    permutation of [0, E); ``dup_info(perm) -> (any_dup, first_socket)``
    reports whether any check row repeats a variable and the flat
    check-socket index of the first offender.  ``method``:

      * ``"reject"`` -- resample the whole permutation until simple (the
        reference's rule, random_code_generator.c:39-47, capped at
        MAX_REJECT_TRIES);
      * ``"repair"`` -- swap the first duplicated socket's permutation
        entry with a uniformly random partner and rescan, one swap per
        pass.  Swaps preserve the permutation property; the expected
        duplicate count is ~ (dv-1)(dc-1)/2 regardless of n, so the
        expected pass count is O(1).
      * ``"raw"`` -- no simplicity conditioning: the uniform
        configuration-model matching, multi-edges and all.  This is the
        ensemble the exact stopping-set analysis averages over
        (utils/stopping_sets.py; test_finite_length_analysis.py:68-69
        normalises by ALL (v dv)-socket matchings), so Monte Carlo
        validation against those exact numbers must use it: conditioning
        on simplicity removes multi-edge obstructions and biases small-n
        BER low by O(1/n) (measured -24% at n=100, -4% at n=512 --
        docs/VALIDATION.md).  The per-socket decode kernels implement
        configuration-model semantics verbatim (a check touching an
        erased variable twice sees two erased sockets), so no decoder
        change is needed.

    Structurally: single ``while_loop``s whose state all flows through
    the carry -- the formulation jax 0.9.0's shard_map varying-manual-
    axes checker accepts.  A scan/fori_loop nested inside a while_loop
    body fails that checker even when correctly replicated (the while
    fixpoint starts carries as unvarying and the inner loop hard-errors
    on the input/output vma mismatch before the fixpoint can promote
    them -- see tests/test_montecarlo.py::test_check_vma_passes).
    """
    key, sub = jax.random.split(key)
    perm = draw_perm(sub)

    if method == "raw":
        return perm

    if method == "reject":
        def cond(carry):
            perm, key, tries = carry
            return jnp.logical_and(dup_info(perm)[0],
                                   tries < MAX_REJECT_TRIES)

        def body(carry):
            perm, key, tries = carry
            key, sub = jax.random.split(key)
            return draw_perm(sub), key, tries + 1
    elif method == "repair":
        def cond(carry):
            perm, key, passes = carry
            return jnp.logical_and(dup_info(perm)[0],
                                   passes < MAX_REPAIR_PASSES)

        def body(carry):
            perm, key, passes = carry
            # cond guarantees a duplicate exists; fix the first offender
            s = dup_info(perm)[1]
            key, k_pick = jax.random.split(key)
            j = jax.random.randint(k_pick, (), 0, E)
            ps, pj = perm[s], perm[j]
            perm = perm.at[s].set(pj).at[j].set(ps)
            return perm, key, passes + 1
    else:
        raise ValueError(f"unknown sampling method {method!r}")

    perm, _, _ = jax.lax.while_loop(cond, body, (perm, key, jnp.int32(0)))
    return perm


def _regular_matching(key: jax.Array, n: int, dv: int, dc: int,
                      method: str) -> jax.Array:
    """(dv,dc)-regular matching via :func:`match_until_simple`."""
    E = n * dv

    def draw_perm(sub):
        return _with_key_vma(jax.random.permutation(sub, E), sub)

    def dup_info(perm):
        # bool[E] in check-socket layout: socket j of row i duplicates an
        # earlier socket of the same row.
        chk = _perm_to_checks(perm, dv, dc)
        eq = chk[:, :, None] == chk[:, None, :]  # [m, dc, dc]
        tri = jnp.tril(jnp.ones((dc, dc), bool), k=-1)
        dup = jnp.any(eq & tri, axis=2).reshape(-1)  # [E]
        return jnp.any(dup), jnp.argmax(dup).astype(jnp.int32)

    perm = match_until_simple(key, E, draw_perm, dup_info, method)
    return _perm_to_checks(perm, dv, dc)


@partial(jax.jit, static_argnames=("n", "dv", "dc", "method"))
def sample_check_table(key: jax.Array, n: int, dv: int, dc: int,
                       method: str = "repair") -> jax.Array:
    """Sample a simple (dv,dc)-regular check->variable table, int32[m, dc]."""
    if (n * dv) % dc != 0:
        raise ValueError("n*dv must be divisible by dc")
    return _regular_matching(key, n, dv, dc, method)


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

    if cfg.lam is not None:
        import hashlib

        from .irregular import IrregularEnsembleSpec

        # platform-independent digest of the degree distributions: Python
        # hash() widths differ across interpreter builds, which would let
        # heterogeneous multi-host jobs derive different "fixed" codes
        digest = hashlib.sha256(
            repr((tuple(cfg.lam), tuple(cfg.rho))).encode()).digest()
        fold = int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
        code_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
            fold)
        spec = IrregularEnsembleSpec.from_lam_rho(cfg.n, cfg.lam, cfg.rho)
        return spec.sample(code_key, cfg.sampler)

    code_key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
        cfg.dv * 1000 + cfg.dc)
    return sample_code(code_key, cfg.n, cfg.dv, cfg.dc, cfg.sampler)
