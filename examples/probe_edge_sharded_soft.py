"""Probe: edge-sharded soft (min-sum) BP -- the LLR analogue of
parallel/edge_sharded.py, measured once per the probe-first discipline.

Candidate for huge-n AWGN statistics (round-3 review item 8): shard the
check set across the mesh, replicate the posterior [n, B] f32, and
SUM-all-reduce the per-device posterior contributions each round (the
soft analogue of the BEC kernel's OR-all-reduce of candidate planes).

The probe answers two questions:

  1. Correctness: on the 8-virtual-device CPU mesh, does the sharded
     kernel reproduce the flooding kernel's posterior?  (It must: the
     psum-reassembled posterior is exactly the flooding posterior.)
  2. Cost: the per-round collective is a psum of [n, B] f32 -- at
     n = 10^5, B = 512 that is 200 MB/round/direction, vs a local check
     workload of E/D socket-gathers.  Measured per-round times (CPU
     mesh D=8 vs D=1, and the single-TPU-chip unsharded round at
     n = 10^5) calibrate whether the collective dominates.

Run twice: on CPU (JAX_PLATFORMS forced in-script, 8 virtual devices)
and on the TPU (single chip, unsharded reference timing).  Record the
verdict in docs/VALIDATION.md.
"""

import os
import time

import numpy as np

N = int(os.environ.get("PROBE_N", 100_000))
B = int(os.environ.get("PROBE_B", 512))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", 20))
SIGMA = 0.82


def make_sharded_minsum(code, mesh, rounds):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    D = mesh.size
    m, dc, dv = code.m, code.dc, code.dv
    assert m % D == 0
    m_local = m // D
    # socket routing: variable v's socket p sits at check c_p(v), socket
    # j_p(v) (edge e = c*dc + j)
    var_c = [code.var_to_edge[:, p] // dc for p in range(dv)]
    var_j = [code.var_to_edge[:, p] % dc for p in range(dv)]

    def per_device(chk_local, var_c_all, var_j_all, llr):
        off = jax.lax.axis_index(axis).astype(jnp.int32) * m_local

        def body(carry, _):
            mcv = carry                       # [dc, m_local, B]
            # partial posterior from the local shard's messages
            partial = jnp.zeros_like(llr)
            for p in range(dv):
                idx = var_c_all[p] - off
                local = (idx >= 0) & (idx < m_local)
                idxc = jnp.clip(idx, 0, m_local - 1)
                # select the right socket plane per variable
                planes = mcv[:, idxc, :]      # [dc, n, B]
                sel = jnp.take_along_axis(
                    planes, var_j_all[p][None, :, None].astype(jnp.int32),
                    axis=0)[0]
                partial = partial + jnp.where(local[:, None], sel, 0.0)
            post = llr + jax.lax.psum(partial, axis)

            # check update on the local shard
            rows = [jnp.take(post, chk_local[:, j], axis=0)
                    - mcv[j] for j in range(dc)]
            rows = [jnp.clip(r, -30.0, 30.0) for r in rows]
            mags = [jnp.abs(r) for r in rows]
            sgns = [r < 0 for r in rows]
            big = jnp.full_like(rows[0], jnp.inf)
            pre_m, suf_m = [big], [big]
            pre_s = [jnp.zeros_like(sgns[0])]
            suf_s = [jnp.zeros_like(sgns[0])]
            for j in range(dc - 1):
                pre_m.append(jnp.minimum(pre_m[-1], mags[j]))
                pre_s.append(pre_s[-1] ^ sgns[j])
            for j in range(dc - 1, 0, -1):
                suf_m.append(jnp.minimum(suf_m[-1], mags[j]))
                suf_s.append(suf_s[-1] ^ sgns[j])
            suf_m.reverse()
            suf_s.reverse()
            new = [jnp.where(pre_s[j] ^ suf_s[j],
                             -jnp.minimum(pre_m[j], suf_m[j]),
                             jnp.minimum(pre_m[j], suf_m[j]))
                   for j in range(dc)]
            return jnp.stack(new), None

        mcv0 = jnp.zeros((dc, m_local, llr.shape[1]), jnp.float32)
        mcv, _ = jax.lax.scan(body, mcv0, None, length=rounds)
        # final posterior
        partial = jnp.zeros_like(llr)
        off2 = off
        for p in range(dv):
            idx = var_c_all[p] - off2
            local = (idx >= 0) & (idx < m_local)
            idxc = jnp.clip(idx, 0, m_local - 1)
            planes = mcv[:, idxc, :]
            sel = jnp.take_along_axis(
                planes, var_j_all[p][None, :, None].astype(jnp.int32),
                axis=0)[0]
            partial = partial + jnp.where(local[:, None], sel, 0.0)
        return llr + jax.lax.psum(partial, axis)

    import jax

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis, None), *([P()] * 2), P()),
        out_specs=P(),
        check_vma=False,
    ))


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() not in ("cpu",)
    print("backend:", jax.default_backend(), "devices:", len(jax.devices()),
          flush=True)
    from iib_project_ldpc_codes_tpu.models import sample_code
    from iib_project_ldpc_codes_tpu.ops.channels import AWGN
    from iib_project_ldpc_codes_tpu.ops.soft_bp import soft_bp_decode

    code = sample_code(jax.random.key(1), N, 3, 6)
    ch = AWGN(SIGMA)

    def mk_llr(i):
        # fresh channel draw per rep: identical repeated executions can
        # be short-circuited by the remote runtime, poisoning timings
        return ch.llr(ch.transmit(jax.random.key(2 + i),
                                  jnp.zeros((N, B), jnp.int32)))

    llr = mk_llr(0)

    # decision/posterior reference (production kernel, early exit OK)
    res = soft_bp_decode(code, llr, ROUNDS, method="minsum")
    jax.block_until_ready(res.posterior)

    # unsharded flooding timing: fixed-rounds scan over the production
    # iteration (the early-exiting while_loop kernel is untimeable here:
    # its exit depends on the noise draw)
    from iib_project_ldpc_codes_tpu.ops.soft_bp import (_posterior,
                                                        _soft_iteration,
                                                        _soft_routing)

    routing = _soft_routing(code)

    @jax.jit
    def flood_fixed(llr_in):
        def body(mcv, _):
            mcv, _, _ = _soft_iteration(code, llr_in, mcv, routing,
                                        "minsum", 1.0, 0.0, jnp.float32,
                                        False)
            return mcv, None
        mcv0 = jnp.zeros((code.dc * code.m, llr_in.shape[1]), jnp.float32)
        mcv, _ = jax.lax.scan(body, mcv0, None, length=ROUNDS)
        return _posterior(code, llr_in, mcv, routing, jnp.float32)

    jax.block_until_ready(flood_fixed(llr))
    reps = 3
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = flood_fixed(mk_llr(i))
    jax.block_until_ready(out)
    t_ref = (time.perf_counter() - t0) / reps
    print(f"unsharded minsum n={N} B={B}: {t_ref/ROUNDS*1e3:.2f} ms/round "
          f"(fixed {ROUNDS}-round scan)", flush=True)

    from jax.sharding import Mesh

    for D in ([1, 8] if not on_tpu else [1]):
        devs = np.array(jax.devices()[:D])
        if len(devs) < D:
            print(f"skip D={D}: not enough devices")
            continue
        mesh = Mesh(devs, ("edge",))
        var_c = [code.var_to_edge[:, p] // code.dc for p in range(code.dv)]
        var_j = [(code.var_to_edge[:, p] % code.dc).astype(jnp.int32)
                 for p in range(code.dv)]
        fn = make_sharded_minsum(code, mesh, ROUNDS)
        post = fn(code.chk_to_var, var_c, var_j, llr)
        jax.block_until_ready(post)
        t0 = time.perf_counter()
        for i in range(1, 4):
            p_i = fn(code.chk_to_var, var_c, var_j, mk_llr(i * 7))
        jax.block_until_ready(p_i)
        t = (time.perf_counter() - t0) / 3
        err = float(jnp.max(jnp.abs(post - res.posterior)))
        dec_match = float(jnp.mean((post < 0) == (res.posterior < 0)))
        print(f"sharded D={D}: {t/ROUNDS*1e3:.2f} ms/round; max|dpost| "
              f"{err:.2e}, decision match {dec_match:.6f}", flush=True)
    vol = N * B * 4 / 1e6
    print(f"per-round psum volume (f32 posterior): {vol:.0f} MB "
          f"-- compare with the local shard's gather traffic "
          f"~{3 * N * B * 4 * 2 / 1e6:.0f}/D MB", flush=True)


if __name__ == "__main__":
    main()
