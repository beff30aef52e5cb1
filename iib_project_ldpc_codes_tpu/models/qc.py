"""Quasi-cyclic (protograph-lifted) LDPC codes.

Beyond-reference extension motivated by a measured limit: at huge n the
random-ensemble packed decoder is gather-locality-bound (0.15 Ginfobit/s
at n=1e6 x 48 words vs 4.5-5.3 at n=1e4; BFS relabeling provably cannot
help -- random Tanner graphs are expanders, docs/VALIDATION.md round-5
sections).  Production LDPC (5G NR, 802.11, DVB-S2) solves this
structurally: the parity-check matrix is a BASE graph whose edges are
Z x Z circulant permutations.  On TPU that structure is a gift -- every
per-edge "gather" becomes a ``jnp.roll`` of a contiguous [Z, W] plane,
i.e. a stream copy at full HBM bandwidth at ANY block length.

Container: a (dvb,dcb)-regular base graph in the same edge-list form as
:class:`..models.code.LDPCCode` (sampled by the existing configuration-
model sampler at base scale), plus an int shift per base edge.  The
lifted code has n = nb * Z variables; check (c, z) of base check c
connects variable (j, (z + s_cj) mod Z) for each base socket j -- the
standard circulant convention.

``expand()`` materialises the lifted code as a plain :class:`LDPCCode`,
so EVERY existing kernel, driver, and analysis runs on QC codes
unchanged (and serves as the bit-exactness oracle for the roll-based
decoder, ops/qc_bp.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .code import LDPCCode, code_from_checks
from .ensemble import sample_check_table


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QCLDPCCode:
    """A Z-lifted (dvb,dcb)-regular protograph code.

    ``base_chk[mb, dcb]`` -- base-variable index per base-check socket
    (a base-scale ``chk_to_var`` table); ``shifts[mb, dcb]`` -- the
    circulant shift of each base edge, in [0, Z).
    """

    base_chk: jax.Array   # int32[mb, dcb]
    shifts: jax.Array     # int32[mb, dcb]
    Z: int = dataclasses.field(metadata=dict(static=True))
    nb: int = dataclasses.field(metadata=dict(static=True))
    dv: int = dataclasses.field(metadata=dict(static=True))
    dc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def mb(self) -> int:
        return (self.nb * self.dv) // self.dc

    @property
    def n(self) -> int:
        return self.nb * self.Z

    @property
    def m(self) -> int:
        return self.mb * self.Z

    @property
    def k(self) -> int:
        return self.n * (self.dc - self.dv) // self.dc

    def expand(self) -> LDPCCode:
        """Materialise the lifted code as a generic edge-list code.

        Lifted variable (j, z) gets index j*Z + z; lifted check (c, z)
        gets index c*Z + z and its socket for base socket (c, jj) is
        variable (base_chk[c, jj], (z + shifts[c, jj]) mod Z).
        """
        base = np.asarray(self.base_chk)
        sh = np.asarray(self.shifts)
        mb, dcb = base.shape
        z = np.arange(self.Z)
        # [mb, Z, dcb]
        var = (base[:, None, :] * self.Z
               + (z[None, :, None] + sh[:, None, :]) % self.Z)
        chk = var.reshape(mb * self.Z, dcb).astype(np.int32)
        return code_from_checks(jnp.asarray(chk), n=self.n, dv=self.dv,
                                dc=self.dc)


def sample_qc_code(key: jax.Array, nb: int, dv: int, dc: int, Z: int,
                   method: str = "repair") -> QCLDPCCode:
    """Sample a QC code: base graph from the (dv,dc) configuration model
    (simple: no repeated variable within a base check -- which also
    guarantees the lifted code is simple for any shifts), shifts uniform
    in [0, Z).  Keyed and reproducible like every sampler here.
    """
    if (nb * dv) % dc:
        raise ValueError("nb*dv must be divisible by dc")
    k_base, k_shift = jax.random.split(key)
    base = sample_check_table(k_base, nb, dv, dc, method)
    shifts = jax.random.randint(k_shift, base.shape, 0, Z, jnp.int32)
    return QCLDPCCode(base_chk=base, shifts=shifts, Z=Z, nb=nb,
                      dv=dv, dc=dc)
