"""Encoder and code-storage tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import (dense_parity_check,
                                               sample_code)
from iib_project_ldpc_codes_tpu.models.encode import make_encoder
from iib_project_ldpc_codes_tpu.models.store import (load_code,
                                                     load_reference_format,
                                                     save_code,
                                                     save_reference_format)
from iib_project_ldpc_codes_tpu.ops import BEC, ERASURE
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_encoder_produces_codewords(seed, rng):
    code = sample_code(jax.random.key(seed), 48, 3, 6)
    h = dense_parity_check(code).astype(int)
    enc = make_encoder(code)
    assert enc.rank + enc.k_eff == 48
    assert enc.rank <= code.m
    info = (rng.random((10, enc.k_eff)) < 0.5).astype(int)
    words = enc.encode(info)
    assert words.shape == (10, 48)
    assert (h @ words.T % 2 == 0).all()
    # systematic: info bits appear verbatim at the free positions
    assert (words[:, enc.free_cols] == info).all()
    # distinct info -> distinct codewords
    assert len({w.tobytes() for w in words}) == len(
        {i.tobytes() for i in info})


def test_encode_then_decode_roundtrip(rng):
    code = sample_code(jax.random.key(5), 96, 3, 6)
    enc = make_encoder(code)
    info = (rng.random(enc.k_eff) < 0.5).astype(int)
    word = enc.encode(info)
    rx = BEC(0.25).transmit(jax.random.key(6), jnp.asarray(word))
    dec, _, _ = bp_decode(code, rx, 60)
    dec = np.asarray(dec)
    resolved = dec != ERASURE
    assert (dec[resolved] == word[resolved]).all()


def test_native_store_roundtrip(tmp_path):
    code = sample_code(jax.random.key(7), 60, 3, 6)
    path = str(tmp_path / "code.npz")
    save_code(code, path)
    loaded = load_code(path)
    assert (np.asarray(loaded.chk_to_var)
            == np.asarray(code.chk_to_var)).all()


def test_reference_format_roundtrip(tmp_path):
    code = sample_code(jax.random.key(8), 60, 3, 6)
    names = save_reference_format(code, str(tmp_path), code_number=3)
    assert names[0] == "code_no_3_n_60_dv_3_dc_6.npy"
    loaded = load_reference_format(str(tmp_path), 3, 60, 3, 6)
    assert (dense_parity_check(loaded) == dense_parity_check(code)).all()
    # stored H is the reference's dense bool bitmap
    h = np.load(tmp_path / names[0])
    assert h.dtype == bool and h.shape == (30, 60)
    # lookups are flattened int32 like random_code_generator.c outputs
    cl = np.load(tmp_path / names[1])
    assert cl.dtype == np.int32 and cl.shape == (180,)
