"""Design an irregular LDPC ensemble and simulate it, in one command.

    python examples/design_ensemble.py [dv_max] [rate] [n] [eps ...]

Designs the LP-optimal variable degree distribution for rho = x^5 at the
target rate (utils.theory.optimize_lambda_for_rate), prints the designed
(lambda, rho) and its exact DE threshold, then runs the Monte Carlo
engine on the designed ensemble at the requested erasure probabilities
(defaults bracket the designed threshold).  The design loop the
reference's regular-only tooling cannot express: design -> closed-form
threshold -> hardware simulation in under a minute per point.
"""

import sys

sys.path.insert(0, ".")

from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
from iib_project_ldpc_codes_tpu.utils import theory

RHO = [0, 0, 0, 0, 0, 1.0]


def main(argv):
    dv_max = int(argv[0]) if len(argv) > 0 else 6
    rate = float(argv[1]) if len(argv) > 1 else 0.5
    n = int(argv[2]) if len(argv) > 2 else 8192

    lam, eps_lp = theory.optimize_lambda_for_rate(RHO, dv_max, rate)
    if lam is None:
        print(f"infeasible: no lambda with dv_max={dv_max} reaches "
              f"rate {rate} for rho=x^5")
        return 1
    lam = [float(v) for v in lam]
    thr = theory.irregular_threshold(lam, RHO, 1e-6)
    print(f"designed lambda (dv_max={dv_max}, rate={rate}): "
          f"{[round(v, 4) for v in lam]}")
    print(f"design-LP eps = {eps_lp:.4f}; exact DE threshold = {thr:.4f} "
          f"(Shannon limit {1 - rate:.4f})")

    eps_list = ([float(e) for e in argv[3:]] if len(argv) > 3
                else [round(thr - 0.03, 4), round(thr - 0.01, 4),
                      round(thr + 0.01, 4)])
    print("eps      BER         FER      trials  secs")
    import time

    for eps in eps_list:
        cfg = SimulationConfig(channel="BEC", channel_param=eps, n=n,
                               lam=lam, rho=RHO, decoder="bp",
                               iterations=150, num_tests=2048,
                               batch=min(2048, 32 * (n // 32)),
                               max_block_errors=10**9,
                               seed=int(eps * 1e4), code_mode="ensemble")
        t = time.time()
        res = run_simulation(cfg)
        print(f"{eps:.4f} {res.bit_error_rate:10.3e} "
              f"{res.block_error_rate:8.4f} {res.num_trials:6d} "
              f"{time.time() - t:5.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
