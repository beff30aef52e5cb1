"""On-device channel models: BEC, BSC, AWGN.

The reference implements only the BEC, with two wire formats
(channels.py:19-26): ``transmit`` maps 0 -> -1 and erases to 0 (the legacy
+-1 convention, channels.py:5), ``new_transmit`` erases to the sentinel 2
(the convention the native decoders consume).  The canonical convention here
is the latter: bits in {0,1}, erasure = 2 (``ERASURE``).

BSC and AWGN are behaviour extensions required by the target configs
(BASELINE.json configs 2 and 3): BSC flips bits with crossover probability
p; AWGN BPSK-modulates (0 -> +1, 1 -> -1) and outputs channel LLRs
``2y/sigma^2``.

All channels are pure functions of a ``jax.random`` key and broadcast over
arbitrary leading batch dimensions.  The all-zero codeword is the default
transmit (every reference simulation sends it, parallel_simulator.py:222).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

ERASURE = 2  # sentinel in the {0,1,2} erasure alphabet (channels.py:24-26)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BEC:
    """Binary erasure channel with erasure probability ``erasure_prob``."""

    erasure_prob: jax.Array | float

    def transmit(self, key: jax.Array, bits: jax.Array) -> jax.Array:
        """bits {0,1} -> {0,1,2}; each bit erased i.i.d. (channels.py:24-26)."""
        u = jax.random.uniform(key, bits.shape)
        return jnp.where(u < self.erasure_prob, ERASURE, bits).astype(jnp.int32)

    def transmit_pm(self, key: jax.Array, bits: jax.Array) -> jax.Array:
        """Legacy +-1 wire format: 0 -> -1, 1 -> 1, erased -> 0
        (channels.py:19-22)."""
        pm = jnp.where(bits == 0, -1, bits)
        u = jax.random.uniform(key, bits.shape)
        return jnp.where(u < self.erasure_prob, 0, pm).astype(jnp.int32)

    def erasure_mask(self, key: jax.Array, shape) -> jax.Array:
        """bool mask of erased positions (for the bit-packed fast path)."""
        return jax.random.uniform(key, shape) < self.erasure_prob


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSC:
    """Binary symmetric channel with crossover probability ``crossover_prob``."""

    crossover_prob: jax.Array | float

    def transmit(self, key: jax.Array, bits: jax.Array) -> jax.Array:
        flips = jax.random.uniform(key, bits.shape) < self.crossover_prob
        return jnp.bitwise_xor(bits.astype(jnp.int32), flips.astype(jnp.int32))

    def flip_mask(self, key: jax.Array, shape) -> jax.Array:
        return jax.random.uniform(key, shape) < self.crossover_prob

    def llr(self, received: jax.Array) -> jax.Array:
        """Channel LLRs log P(y|0)/P(y|1) for received hard bits."""
        p = self.crossover_prob
        mag = jnp.log((1 - p) / p)
        return jnp.where(received == 0, mag, -mag)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AWGN:
    """Binary-input AWGN channel, BPSK mapping 0 -> +1, 1 -> -1.

    ``sigma`` is the per-dimension noise standard deviation; Eb/N0 in dB for
    a rate-R code satisfies sigma^2 = 1 / (2 R 10^(EbN0_dB/10)).
    """

    sigma: jax.Array | float

    def transmit(self, key: jax.Array, bits: jax.Array) -> jax.Array:
        """Returns soft channel outputs y = (1-2b) + sigma * z."""
        noise = jax.random.normal(key, bits.shape) * self.sigma
        return (1.0 - 2.0 * bits.astype(jnp.float32)) + noise

    def llr(self, received: jax.Array) -> jax.Array:
        """Channel LLRs 2y/sigma^2 (positive favours bit 0)."""
        return 2.0 * received / (self.sigma * self.sigma)

    @staticmethod
    def sigma_from_ebn0_db(ebn0_db, rate: float):
        return (2.0 * rate * 10.0 ** (jnp.asarray(ebn0_db) / 10.0)) ** -0.5


def all_zero_codeword(n: int, dtype=jnp.int32) -> jax.Array:
    """The default transmit of every reference run (simulator.py:253)."""
    return jnp.zeros((n,), dtype)


@partial(jax.jit, static_argnames=("shape",))
def bec_packed_channel(key: jax.Array, erasure_prob, shape) -> jax.Array:
    """Bit-packed erasure mask: uint32[*shape] with each of the 32 bits an
    independent Bernoulli(erasure_prob) draw.

    One uint32 word holds the erasure indicators of 32 Monte Carlo trials at
    one variable node -- the native input format of the bit-packed decoder.
    """
    from .bitops import bernoulli_packed

    return bernoulli_packed(key, erasure_prob, shape)
