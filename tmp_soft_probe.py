"""Baseline soft-BP timings on the real chip (current formulation)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jnp.zeros(1))  # tunnel warmup

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops.channels import AWGN
from iib_project_ldpc_codes_tpu.ops.soft_bp import soft_bp_decode

n, dv, dc, iters = 8192, 3, 6, 50
k = n // 2
code = sample_code(jax.random.key(0), n, dv, dc)
ch = AWGN(AWGN.sigma_from_ebn0_db(1.5, 0.5))


def bench(method, dtype, B, check_every=1, reps=3):
    y = ch.transmit(jax.random.key(1), jnp.zeros((n, B), jnp.int32))
    llr = ch.llr(y)
    fn = jax.jit(lambda llr: soft_bp_decode(
        code, llr, iters, method=method, msg_dtype=dtype,
        check_every=check_every).error_totals)
    out = fn(llr); jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(llr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / reps
    gbps = k * B / dt / 1e9
    print(f"{method:10s} {np.dtype(dtype).name if dtype!=jnp.bfloat16 else 'bf16':8s} "
          f"B={B:5d} ce={check_every} {dt*1e3:8.1f} ms  {gbps:.4f} Ginfobit/s",
          flush=True)
    return gbps


for B in (512, 1024, 2048):
    bench("sumproduct", jnp.bfloat16, B)
bench("sumproduct", jnp.float32, 1024)
bench("sumproduct", jnp.bfloat16, 1024, check_every=5)
for B in (1024, 2048):
    bench("minsum", jnp.bfloat16, B)
bench("minsum", jnp.float32, 1024)
bench("minsum", jnp.bfloat16, 1024, check_every=5)
