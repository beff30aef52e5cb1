"""Bit-for-bit parity against the reference's compiled C decoder.

Builds message_passing.c from the read-only reference checkout (when
present) and drives it via ctypes on the same codes and channel outputs as
our decoder: decoded sequences and per-iteration error arrays must match
exactly, including the stall-copy and early-exit tail semantics
(message_passing.c:16-19, :69-78).

Skipped automatically when the reference checkout is absent (CI without
the reference still runs the independent numpy-oracle tests).
"""

import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops import BEC
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "message_passing.c")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def c_decoder(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refc")
    so = tmp / "message_passing.so"
    subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC",
         os.path.join(REFERENCE, "message_passing.c"), "-o", str(so)],
        check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.message_passing.restype = ctypes.c_int
    return lib


def run_reference_decoder(lib, code, channel_output, max_iters):
    mvc = np.array(channel_output, dtype=np.int32)
    var_lookup = np.asarray(code.var_to_chk, np.int32).reshape(-1)
    chk_lookup = np.asarray(code.chk_to_var, np.int32).reshape(-1)
    errors = np.zeros(max_iters, np.int32)
    lib.message_passing(
        mvc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(max_iters),
        var_lookup.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        chk_lookup.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(code.n), ctypes.c_int(code.k),
        ctypes.c_int(code.dv), ctypes.c_int(code.dc))
    return mvc, errors


@pytest.mark.parametrize("eps", [0.2, 0.35, 0.42, 0.5, 0.65])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_decoder_matches_reference_c(c_decoder, eps, seed):
    n, iters = 96, 40
    code = sample_code(jax.random.key(seed), n, 3, 6)
    rx = np.asarray(BEC(eps).transmit(jax.random.key(1000 + seed),
                                      jnp.zeros(n, jnp.int32)))
    ref_dec, ref_err = run_reference_decoder(c_decoder, code, rx, iters)
    our_dec, our_err, _ = bp_decode(code, jnp.asarray(rx), iters)
    our_dec, our_err = np.asarray(our_dec), np.asarray(our_err)
    assert (our_dec == ref_dec).all(), f"decoded mismatch at eps={eps}"
    # our errors[0] is the prepended initial count
    # (parallel_simulator.py:165); the C array is errors[1:]
    assert our_err[0] == (rx == 2).sum()
    assert (our_err[1:] == ref_err).all(), (
        f"error-array mismatch at eps={eps}:\nC  ={ref_err}\nours"
        f"={our_err[1:]}")


def test_reference_parity_larger_code(c_decoder):
    n, iters = 1020, 60
    code = sample_code(jax.random.key(9), n, 3, 6)
    rx = np.asarray(BEC(0.42).transmit(jax.random.key(99),
                                       jnp.zeros(n, jnp.int32)))
    ref_dec, ref_err = run_reference_decoder(c_decoder, code, rx, iters)
    our_dec, our_err, _ = bp_decode(code, jnp.asarray(rx), iters)
    assert (np.asarray(our_dec) == ref_dec).all()
    assert (np.asarray(our_err)[1:] == ref_err).all()
