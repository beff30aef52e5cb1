"""Probe: layered (serial-C) min-sum vs flooding on the soft-BP roof.

Round-3 review item: the one algorithmic lever left above the measured
soft-decision bandwidth roof (docs/VALIDATION.md "soft roof") is a
layered schedule -- check layers updated sequentially within a sweep see
each other's fresh messages, so convergence takes roughly half the
sweeps.  Whether it WINS on TPU depends on the price: each layer is a
sequential stage with scatter-adds into the posterior, so a sweep costs
more than a flooding round.  This probe measures both sides:

  * rounds/sweeps until 99% of trials satisfy every check,
  * wall-clock per round/sweep at the roof batch (B=2048, n=8192),

and reports the product (time-to-converged).  One fixed (3,6) code,
AWGN below the min-sum threshold sigma*=0.8233 (sigma in {0.75,
0.78}: convergent but nontrivial -- at sigma >= 0.80 neither schedule
reaches 99% satisfied within the budget and the comparison is
uninformative), unnormalised min-sum f32.

Layered semantics here: checks are partitioned into L contiguous layers;
a layer's checks read the CURRENT posterior (including earlier layers'
updates this sweep), subtract their stored extrinsic, min-sum, and
scatter the delta back.  Variables hit twice within one layer see the
pre-layer posterior for both (shuffled-BP approximation); correctness is
checked against flooding at long budgets (same fixed points to MC
accuracy).

Run on the TPU.  Appends its verdict to stdout; record in VALIDATION.md.
"""

import time

import numpy as np

import os

N = int(os.environ.get("PROBE_N", 8192))
B = int(os.environ.get("PROBE_B", 2048))
SIGMAS = tuple(float(s) for s in
               os.environ.get("PROBE_SIGMAS", "0.75,0.78").split(","))
MAX_SWEEPS = int(os.environ.get("PROBE_SWEEPS", 60))


def make_layered(code, L, max_sweeps):
    import jax
    import jax.numpy as jnp

    m, dc, dv = code.m, code.dc, code.dv
    assert m % L == 0
    ml = m // L
    chk = code.chk_to_var  # [m, dc]

    @jax.jit
    def decode(llr):
        llr = jnp.asarray(llr, jnp.float32)

        def sweep(carry, _):
            post, mcv = carry   # post [n, B]; mcv [dc*m, B] flat
            def layer(carry, l):
                post, mcv = carry
                rows_idx = [jax.lax.dynamic_slice_in_dim(chk[:, j], l * ml,
                                                         ml)
                            for j in range(dc)]
                old = [jax.lax.dynamic_slice_in_dim(mcv, j * m + l * ml, ml)
                       for j in range(dc)]
                ext = [jnp.clip(jnp.take(post, rows_idx[j], axis=0)
                                - old[j], -30.0, 30.0) for j in range(dc)]
                # min-sum over the dc planes (prefix/suffix)
                mags = [jnp.abs(p) for p in ext]
                sgns = [p < 0 for p in ext]
                big = jnp.full_like(ext[0], jnp.inf)
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
                for j in range(dc):
                    mag = jnp.minimum(pre_m[j], suf_m[j])
                    new = jnp.where(pre_s[j] ^ suf_s[j], -mag, mag)
                    post = post.at[rows_idx[j]].add(new - old[j])
                    mcv = jax.lax.dynamic_update_slice_in_dim(
                        mcv, new, j * m + l * ml, 0)
                return (post, mcv), None

            (post, mcv), _ = jax.lax.scan(layer, (post, mcv),
                                          jnp.arange(L))
            # syndrome of the current posterior
            bits = jnp.take(post < 0, chk.reshape(-1), axis=0) \
                .reshape(m, dc, -1)
            parity = bits[:, 0]
            for j in range(1, dc):
                parity = parity ^ bits[:, j]
            unsat = jnp.sum(jnp.any(parity, axis=0)).astype(jnp.int32)
            return (post, mcv), unsat

        post0 = llr
        mcv0 = jnp.zeros((dc * m, llr.shape[1]), jnp.float32)
        (post, _), unsat = jax.lax.scan(sweep, (post0, mcv0), None,
                                        length=max_sweeps)
        return post, unsat

    return decode


def make_flooding(code, max_iters):
    """Per-round unsatisfied-trial counts for the production kernel;
    built once so timing excludes tracing/compilation."""
    import jax
    import jax.numpy as jnp
    from iib_project_ldpc_codes_tpu.ops.soft_bp import (_posterior,
                                                        _soft_iteration,
                                                        _soft_routing)

    routing = _soft_routing(code)

    @jax.jit
    def run(llr):
        llr = jnp.asarray(llr, jnp.float32)

        def body(mcv, _):
            mcv, post_prev, sat_prev = _soft_iteration(
                code, llr, mcv, routing, "minsum", 1.0, 0.0, jnp.float32,
                False)
            return mcv, jnp.sum(~sat_prev).astype(jnp.int32)

        mcv0 = jnp.zeros((code.dc * code.m, llr.shape[1]), jnp.float32)
        mcv, unsat = jax.lax.scan(body, mcv0, None, length=max_iters)
        post = _posterior(code, llr, mcv, routing, jnp.float32)
        return post, unsat

    return run


def time_fn(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(1))
    print("devices:", jax.devices(), flush=True)
    from iib_project_ldpc_codes_tpu.models import sample_code
    from iib_project_ldpc_codes_tpu.ops.channels import AWGN

    code = sample_code(jax.random.key(3), N, 3, 6)
    for sigma in SIGMAS:
        ch = AWGN(sigma)
        llr = ch.llr(ch.transmit(jax.random.key(9),
                                 jnp.zeros((N, B), jnp.int32)))
        flood = make_flooding(code, MAX_SWEEPS)
        t_flood, (postf, unsat_f) = time_fn(flood, llr)
        unsat_f = np.asarray(unsat_f)
        ber_f = float(np.asarray(jnp.sum(postf < 0)) / (N * B))

        def conv_round(u, frac=0.01):
            ok = np.nonzero(u <= frac * B)[0]
            return int(ok[0]) + 1 if len(ok) else None

        print(f"sigma={sigma} flooding: {t_flood/MAX_SWEEPS*1e3:.2f} "
              f"ms/round, rounds-to-99% {conv_round(unsat_f)}, "
              f"final unsat {unsat_f[-1]}/{B}, BER {ber_f:.2e}",
              flush=True)
        for L in (2, 4):
            dec = make_layered(code, L, MAX_SWEEPS)
            t_lay, (postl, unsat_l) = time_fn(dec, llr)
            unsat_l = np.asarray(unsat_l)
            ber_l = float(np.asarray(jnp.sum(postl < 0)) / (N * B))
            cr = conv_round(unsat_l)
            cf = conv_round(unsat_f)
            t_to_conv_f = (t_flood / MAX_SWEEPS) * cf if cf else np.inf
            t_to_conv_l = (t_lay / MAX_SWEEPS) * cr if cr else np.inf
            print(f"sigma={sigma} layered L={L}: "
                  f"{t_lay/MAX_SWEEPS*1e3:.2f} ms/sweep, "
                  f"sweeps-to-99% {cr}, final unsat {unsat_l[-1]}/{B}, "
                  f"BER {ber_l:.2e}; time-to-99%: layered "
                  f"{t_to_conv_l*1e3:.1f} ms vs flooding "
                  f"{t_to_conv_f*1e3:.1f} ms -> "
                  f"{'LAYERED WINS' if t_to_conv_l < t_to_conv_f else 'flooding wins'}",
                  flush=True)


if __name__ == "__main__":
    main()
