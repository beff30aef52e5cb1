"""Run the five BASELINE.json target configurations end-to-end.

Each config runs at a scaled-down default (finishes in minutes on CPU or
one chip) and at full scale with ``--full``.  Results are written as
structured JSON under ``results/baseline/`` and summary lines printed.

Usage:
    python examples/run_baseline_configs.py [--full] [--platform=cpu]
    python examples/run_baseline_configs.py --only=3
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    flags = {a.split("=")[0].lstrip("-"): (a.split("=", 1)[1] if "=" in a
                                           else True)
             for a in argv if a.startswith("--")}
    full = bool(flags.get("full"))
    only = int(flags["only"]) if "only" in flags else None

    if flags.get("platform") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from iib_project_ldpc_codes_tpu.models import sample_code
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils import theory
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.results import save_result
    from iib_project_ldpc_codes_tpu.utils.sweeps import sweep_channel_param

    out = "results/baseline"

    def run1():
        """Config 1: (3,6) n=1024, BEC eps=0.4, peeling decoder."""
        cfg = SimulationConfig(
            channel="BEC", channel_param=0.4, n=1024, dv=3, dc=6,
            decoder="peeling", num_tests=4096 if full else 512,
            batch=512, max_block_errors=200, output_dir=out)
        code = sample_code(jax.random.key(1), cfg.n, 3, 6)
        r = run_simulation(cfg, code=code)
        save_result(r)
        print(f"[1] peeling n=1024 eps=0.4: FER={r.block_error_rate:.4g} "
              f"BER={r.bit_error_rate:.4g} trials={r.num_trials}")

    def run2():
        """Config 2: BSC Gallager-A, n=4096, crossover sweep."""
        base = SimulationConfig(
            channel="BSC", channel_param=0.02, n=4096, dv=3, dc=6,
            decoder="gallager", iterations=40,
            num_tests=8192 if full else 1024, batch=1024,
            max_block_errors=200, output_dir=out)
        code = sample_code(jax.random.key(2), base.n, 3, 6)
        ps = [0.01, 0.02, 0.03, 0.04, 0.05] if full else [0.02, 0.04]
        rs = sweep_channel_param(base, ps, code=code, save=True)
        for r in rs:
            print(f"[2] gallager n=4096 p={r.config.channel_param}: "
                  f"FER={r.block_error_rate:.4g} "
                  f"BER={r.bit_error_rate:.4g}")

    def run3():
        """Config 3: AWGN sum-product BP, n=8192, BER/FER curve."""
        base = SimulationConfig(
            channel="AWGN", channel_param=0.8, n=8192, dv=3, dc=6,
            decoder="sumproduct", iterations=50,
            num_tests=4096 if full else 256, batch=256,
            max_block_errors=200, output_dir=out)
        code = sample_code(jax.random.key(3), base.n, 3, 6)
        from iib_project_ldpc_codes_tpu.ops.channels import AWGN

        dbs = [1.0, 1.5, 2.0, 2.5] if full else [1.5, 2.5]
        sigmas = [float(AWGN.sigma_from_ebn0_db(db, 0.5)) for db in dbs]
        rs = sweep_channel_param(base, sigmas, code=code, save=True)
        for db, r in zip(dbs, rs):
            print(f"[3] sumproduct n=8192 Eb/N0={db}dB: "
                  f"FER={r.block_error_rate:.4g} "
                  f"BER={r.bit_error_rate:.4g}")

    def run4():
        """Config 4: expurgated ensemble finite-length scaling sweep."""
        base = SimulationConfig(
            channel="BEC", channel_param=0.40, n=2048, dv=3, dc=6,
            decoder="bp", iterations=100, expurgation=1,
            num_tests=8192 if full else 1024, batch=1024,
            code_mode="ensemble", codes_per_chunk=32,
            max_block_errors=10**9, output_dir=out)
        eps = ([0.38, 0.40, 0.42, 0.44] if full else [0.40, 0.43])
        rs = sweep_channel_param(base, eps, save=True)
        thr = theory.calc_threshold(3, 6)
        for r in rs:
            pred = float(theory.waterfall_block_error(
                r.config.n, [r.config.channel_param],
                finite_size_shift=True)[0])
            print(f"[4] expurgated n=2048 eps={r.config.channel_param}: "
                  f"FER={r.block_error_rate:.4g} (waterfall {pred:.4g}) "
                  f"excluded={r.excluded_trials}")
        print(f"[4] threshold eps*(3,6)={thr:.7f} "
              f"alpha={theory.calculate_alpha(thr, 3, 6):.4f}")

    def run5():
        """Config 5: DE threshold validation + edge-sharded huge-n BP."""
        thr36 = theory.calc_threshold(3, 6)
        thr48 = theory.calc_threshold(4, 8)
        print(f"[5] eps*(3,6)={thr36:.7f} (anchor 0.4294375), "
              f"eps*(4,8)={thr48:.7f} (anchor 0.3834453)")
        from iib_project_ldpc_codes_tpu.ops.channels import bec_packed_channel
        from iib_project_ldpc_codes_tpu.parallel.edge_sharded import (
            edge_sharded_bp_decode)
        from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh

        n = 1_000_000 if full else 65_536
        words = 1
        mesh = make_mesh()
        code = sample_code(jax.random.key(5), n, 3, 6, method="repair")
        erased = bec_packed_channel(jax.random.key(6), 0.42, (n, words))
        res = edge_sharded_bp_decode(code, erased, 200, mesh)
        fer = float(np.asarray(res.failed).mean())
        print(f"[5] edge-sharded BP n={n} over {mesh.size} devices: "
              f"FER={fer:.4g} iters={int(res.iterations)}")

    runners = {1: run1, 2: run2, 3: run3, 4: run4, 5: run5}
    for idx in sorted(runners):
        if only is None or idx == only:
            runners[idx]()


if __name__ == "__main__":
    main(sys.argv[1:])
