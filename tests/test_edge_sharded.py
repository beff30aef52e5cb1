"""Edge-sharded BP tests: bit-identical to the single-device fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops import BEC
from iib_project_ldpc_codes_tpu.ops.bitops import pack_bits
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode_packed_allzero
from iib_project_ldpc_codes_tpu.parallel.edge_sharded import (
    edge_sharded_bp_decode)
from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("eps", [0.35, 0.45])
def test_edge_sharded_matches_single_device(eps):
    n, W = 192, 2
    code = sample_code(jax.random.key(1), n, 3, 6)
    mask = BEC(eps).erasure_mask(jax.random.key(2), (n, 32 * W))
    erased = pack_bits(mask)
    mesh = make_mesh()
    assert mesh.size == 8
    single = bp_decode_packed_allzero(code, erased, 60)
    sharded = edge_sharded_bp_decode(code, erased, 60, mesh)
    assert (np.asarray(single.known) == np.asarray(sharded.known)).all()
    assert (np.asarray(single.error_totals)
            == np.asarray(sharded.error_totals)).all()
    assert int(single.iterations) == int(sharded.iterations)


def test_edge_sharded_rejects_indivisible():
    code = sample_code(jax.random.key(3), 100, 3, 6)  # m=50, not /8
    mesh = make_mesh()
    erased = jnp.zeros((100, 1), jnp.uint32)
    with pytest.raises(ValueError):
        edge_sharded_bp_decode(code, erased, 10, mesh)


def test_edge_sharded_large_n_smoke():
    """A 'huge-n' smoke run (n scaled down for CI): decodes below
    threshold."""
    n, W = 4096, 1
    code = sample_code(jax.random.key(4), n, 3, 6)
    mask = BEC(0.40).erasure_mask(jax.random.key(5), (n, 32))
    erased = pack_bits(mask)
    mesh = make_mesh()
    res = edge_sharded_bp_decode(code, erased, 100, mesh)
    # at eps=0.40 < eps* and n=4096, almost all trials decode
    assert float(np.asarray(res.failed).mean()) < 0.3
    assert int(res.error_totals[-1]) <= int(res.error_totals[0])
