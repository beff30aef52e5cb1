"""Iteration-variant shootout: take modes, exactly-one formulations, W."""
import time
import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jnp.zeros(1))
from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops.channels import bec_packed_channel
from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
    bp_decode_packed_allzero, _packed_iteration_allzero)

n, dv, dc, W, iters = 10_000, 3, 6, 512, 50
code = sample_code(jax.random.key(0), n, dv, dc)
erased = bec_packed_channel(jax.random.key(1), 0.42, (n, W))
known0 = ~erased
cv = code.chk_to_var
vc = code.var_to_chk


def timeit(fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    s = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - s) / reps


def loop50(iter_fn):
    @jax.jit
    def f(known):
        return jax.lax.fori_loop(0, iters, lambda _, k: iter_fn(k), known)
    return f


# V0: current implementation
v0 = loop50(lambda k: _packed_iteration_allzero(code, k))

# V1: promise_in_bounds takes
def it_v1(known):
    kns = [known.at[cv[:, j]].get(mode="promise_in_bounds")
           for j in range(dc)]
    full = jnp.uint32(0xFFFFFFFF)
    pre = [jnp.full_like(kns[0], full)]
    for j in range(dc - 1):
        pre.append(pre[-1] & kns[j])
    suf = [jnp.full_like(kns[0], full)]
    for j in range(dc - 1, 0, -1):
        suf.append(suf[-1] & kns[j])
    suf.reverse()
    eo = jnp.zeros_like(kns[0])
    for j in range(dc):
        eo = eo | (~kns[j] & pre[j] & suf[j])
    acc = eo.at[vc[:, 0]].get(mode="promise_in_bounds")
    for j in range(1, dv):
        acc = acc | eo.at[vc[:, j]].get(mode="promise_in_bounds")
    return known | acc

v1 = loop50(it_v1)

# V2: a/b accumulator exactly-one (single pass), default take
def it_v2(known):
    a = jnp.zeros((code.m, W), jnp.uint32)
    b = jnp.zeros((code.m, W), jnp.uint32)
    for j in range(dc):
        u = ~jnp.take(known, cv[:, j], axis=0)
        b = b | (a & u)
        a = a | u
    eo = a & ~b
    acc = jnp.take(eo, vc[:, 0], axis=0)
    for j in range(1, dv):
        acc = acc | jnp.take(eo, vc[:, j], axis=0)
    return known | acc

v2 = loop50(it_v2)

# V3: a/b + promise_in_bounds
def it_v3(known):
    a = jnp.zeros((code.m, W), jnp.uint32)
    b = jnp.zeros((code.m, W), jnp.uint32)
    for j in range(dc):
        u = ~known.at[cv[:, j]].get(mode="promise_in_bounds")
        b = b | (a & u)
        a = a | u
    eo = a & ~b
    acc = eo.at[vc[:, 0]].get(mode="promise_in_bounds")
    for j in range(1, dv):
        acc = acc | eo.at[vc[:, j]].get(mode="promise_in_bounds")
    return known | acc

v3 = loop50(it_v3)

# correctness cross-check
r0 = v0(known0); r1 = v1(known0); r2 = v2(known0); r3 = v3(known0)
print("equal:", bool(jnp.all(r0 == r1)), bool(jnp.all(r0 == r2)),
      bool(jnp.all(r0 == r3)), flush=True)

for name, f in (("V0 current", v0), ("V1 pib", v1), ("V2 ab", v2),
                ("V3 ab+pib", v3)):
    t = timeit(f, known0)
    print(f"{name}: {t*1e3:.2f} ms ({t/iters*1e3:.3f} ms/iter)", flush=True)

# W robustness for the best candidates at full-decode level
for Wt in (512, 768, 896):
    er = bec_packed_channel(jax.random.key(1), 0.42, (n, Wt))
    ts = [timeit(lambda e: bp_decode_packed_allzero(code, e, iters), er)
          for _ in range(3)]
    thr = [(n // 2) * Wt * 32 / t / 1e9 for t in ts]
    print(f"W={Wt}: " + " ".join(f"{x:.2f}" for x in thr) + " Gbit/s",
          flush=True)
