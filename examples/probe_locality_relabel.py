"""Probe: Tanner-graph locality relabeling for huge-n packed BP.

Motivation (throughput_vs_n.json, round 5): at n=1e6 the packed decode
runs 19x slower than an equal-plane-memory n=1e5 workload -- narrow
uint32 rows AND a huge gather index range degrade realized bandwidth.
"Sorted indices don't help" (CLAUDE.md) was measured at n=1e4 where
the whole plane is small; this probes whether a bandwidth-reducing
RELABELING of the graph (BFS/Cuthill-McKee-style: variables and checks
numbered by breadth-first discovery, so each check's dc gathers land in
a narrow row window) recovers throughput at n in {1e5, 1e6}.

Relabeling is ensemble-invariant (a permutation of variable and check
labels), so error statistics are unchanged; only memory locality moves.

Run (TPU): python examples/probe_locality_relabel.py
"""

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bfs_relabel(chk: np.ndarray, n: int):
    """BFS over the bipartite graph; returns (new chk table, v_perm,
    c_perm) with ids in discovery order."""
    m, dc = chk.shape
    dv = chk.size // n
    var_checks = [[] for _ in range(n)]
    for c in range(m):
        for v in chk[c]:
            var_checks[v].append(c)
    v_new = np.full(n, -1, np.int64)
    c_new = np.full(m, -1, np.int64)
    nv = nc = 0
    for seed in range(n):
        if v_new[seed] >= 0:
            continue
        q = deque([("v", seed)])
        v_new[seed] = nv
        nv += 1
        while q:
            kind, x = q.popleft()
            if kind == "v":
                for c in var_checks[x]:
                    if c_new[c] < 0:
                        c_new[c] = nc
                        nc += 1
                        q.append(("c", c))
            else:
                for v in chk[x]:
                    if v_new[v] < 0:
                        v_new[v] = nv
                        nv += 1
                        q.append(("v", v))
    # new table: row c_new[c] holds v_new of the old participants
    out = np.empty_like(chk)
    out[c_new] = v_new[chk]
    return out, v_new, c_new


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.zeros(1))
    print(f"warmup {time.time() - t0:.0f}s", flush=True)

    from iib_project_ldpc_codes_tpu.models import sample_code
    from iib_project_ldpc_codes_tpu.models.code import code_from_checks
    from iib_project_ldpc_codes_tpu.ops.channels import bec_packed_channel
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_allzero)

    iters, eps = 50, 0.42
    for n, words in [(100_000, 512), (1_000_000, 48)]:
        code = sample_code(jax.random.key(0), n, 3, 6)
        chk = np.asarray(code.chk_to_var)
        t = time.time()
        chk2, _, _ = bfs_relabel(chk, n)
        print(f"n={n}: BFS relabel {time.time() - t:.1f}s; "
              f"row spread median "
              f"{np.median(chk.max(1) - chk.min(1)):.0f} -> "
              f"{np.median(chk2.max(1) - chk2.min(1)):.0f}", flush=True)
        code2 = code_from_checks(jnp.asarray(chk2), n=n, dv=3, dc=6)
        erased = bec_packed_channel(jax.random.key(1), eps, (n, words))
        for tag, c in [("baseline ", code), ("relabeled", code2)]:
            fn = jax.jit(lambda e, c=c: bp_decode_packed_allzero(
                c, e, iters).error_totals)
            out = fn(erased)
            jax.block_until_ready(out)
            reps = 3
            t = time.perf_counter()
            for _ in range(reps):
                out = fn(erased)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t) / reps
            rate = (n // 2) * 32 * words / dt
            print(f"  {tag}: {dt * 1e3:8.1f} ms -> "
                  f"{rate / 1e9:.2f} Ginfobit/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
