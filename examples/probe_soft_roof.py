"""Soft-BP roof probe: decompose the int8 min-sum round on the real chip.

Methodology behind the docs/VALIDATION.md soft-decision roof argument.
At the AWGN config-3 shapes (n=8192, (3,6), B lanes, 50 rounds), times:

  contig      -- contiguous read+write of the [dc*m, B] int8 state
                 (roll+add): the chip's realized r/w stream roof.
  gather      -- the same state moved through one permuted row-gather per
                 round: gathers vs contiguous speed.
  post_gather -- the round's full bandwidth skeleton (dv posterior
                 gathers -> int16 accumulate -> int8 saturate -> dc
                 check-side gathers -> state write), no check math.
  minsum_only -- contiguous slices -> extrinsic min-sum -> write: the
                 check-update VPU cost on top of a pure state pass.
  full        -- the real round (ops/soft_bp._soft_iteration).

Run from the repo root: python examples/probe_soft_roof.py
(TPU; give it >= 5 min -- several jit compiles through the tunnel.)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
np.asarray(jnp.zeros(1))  # tunnel warmup
print(f"warmup {time.time()-t0:.0f}s", flush=True)

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops import soft_bp as sb

n, dv, dc, iters, B = 8192, 3, 6, 50, 2048
m = n * dv // dc
code = sample_code(jax.random.key(0), n, dv, dc)
tvi = [jnp.asarray(np.asarray(t)) for t in sb._soft_routing(code)]
chk = code.chk_to_var
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(dc * m), jnp.int32)
mcv0 = jnp.asarray(rng.integers(-100, 100, (dc * m, B), np.int8))
llr0 = jnp.asarray(rng.integers(-100, 100, (n, B), np.int8))


def timeit(fn, arg, reps=5):
    out = fn(arg)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t) / reps


def loop(body):
    @jax.jit
    def run(mcv):
        return jax.lax.fori_loop(0, iters, lambda i, s: body(s), mcv)
    return run


def posterior(mcv):
    post = llr0.astype(jnp.int16)
    for p in range(dv):
        post = post + jnp.take(mcv, tvi[p], axis=0).astype(jnp.int16)
    return post


def v_contig(mcv):
    return jnp.roll(mcv, 1, axis=0) + jnp.int8(1)


def v_gather(mcv):
    return jnp.take(mcv, perm, axis=0)


def v_post_gather(mcv):
    pm = jnp.clip(posterior(mcv), -127, 127).astype(jnp.int8)
    return jnp.concatenate(
        [jnp.take(pm, chk[:, j], axis=0) for j in range(dc)], axis=0)


def v_minsum_only(mcv):
    rows = [mcv[j * m:(j + 1) * m].astype(jnp.int16) for j in range(dc)]
    new_rows = sb._check_update_minsum(rows, 1.0, 0.0, mag_cap=127)
    return jnp.concatenate([r.astype(jnp.int8) for r in new_rows], axis=0)


def v_full(mcv):
    mcv2, _, _ = sb._soft_iteration(code, llr0, mcv, tvi, "minsum",
                                    1.0, 0.0, jnp.int16, True)
    return mcv2


state_mb = dc * m * B / 1e6
for name, body in [("contig", v_contig), ("gather", v_gather),
                   ("post_gather", v_post_gather),
                   ("minsum_only", v_minsum_only), ("full", v_full)]:
    dt = timeit(loop(body), mcv0) / iters
    print(f"{name:12s} {dt*1e3:6.3f} ms/round "
          f"(state r+w at this rate = {2*state_mb/(dt*1e3):5.1f} GB/s)",
          flush=True)


# -- int4 message planes (VERDICT round-2 item 8, probe only) --------------
# Two messages per byte along the lane axis: the skeleton's state bytes
# halve; unpack/pack costs extra VPU shifts.  Speed probe only (int4
# min-sum quantisation quality is a separate question).

def pack4(x):
    """int16/int8 [rows, B] -> uint8 [rows, B//2], values clipped to
    [-8, 7], lane pairs packed low-nibble-first."""
    x = jnp.clip(x, -8, 7).astype(jnp.int8)
    lo = x[:, 0::2] & jnp.int8(0x0F)
    hi = (x[:, 1::2] & jnp.int8(0x0F)) << 4
    return (lo | hi).astype(jnp.uint8)


def unpack4(p):
    """uint8 [rows, B//2] -> int8 [rows, B] (sign-extended nibbles)."""
    lo = ((p << 4).astype(jnp.int8)) >> 4
    hi = p.astype(jnp.int8) >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)


mcv4_0 = pack4(jnp.asarray(rng.integers(-8, 8, (dc * m, B), np.int16)))


def v4_gather(mcv4):
    return jnp.take(mcv4, perm, axis=0)


def v4_full(mcv4):
    post = llr0.astype(jnp.int16)
    for p in range(dv):
        post = post + unpack4(jnp.take(mcv4, tvi[p], axis=0))
    pm4 = pack4(post)
    rows = [unpack4(jnp.take(pm4, chk[:, j], axis=0)).astype(jnp.int16)
            - unpack4(mcv4[j * m:(j + 1) * m]) for j in range(dc)]
    new_rows = sb._check_update_minsum(rows, 1.0, 0.0, mag_cap=7)
    return jnp.concatenate([pack4(r) for r in new_rows], axis=0)


for name, body in [("int4_gather", v4_gather), ("int4_full", v4_full)]:
    dt = timeit(loop(body), mcv4_0) / iters
    print(f"{name:12s} {dt*1e3:6.3f} ms/round "
          f"(half-size state r+w = {state_mb/(dt*1e3):5.1f} GB/s)",
          flush=True)
print("DONE", flush=True)
