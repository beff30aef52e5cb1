"""Sweep drivers: channel-parameter and block-length sweeps.

The reference runs sweeps as externally-orchestrated HPC array jobs (one
process per (eps, seed) point, merged offline).  Here a sweep is a loop of
batched runs sharing one engine and one results directory -- with the
device mesh inside each point instead of across points.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Sequence

from ..models.ensemble import sample_code
from .config import SimulationConfig
from .results import SimulationResult, save_result


def sweep_channel_param(base: SimulationConfig, values: Sequence[float],
                        code=None, mesh=None, save: bool = False,
                        verbose: bool = False) -> List[SimulationResult]:
    """Run the Monte Carlo at each channel parameter value.

    The reference's erasure-probability sweeps (one argv per eps,
    parallel_simulator.py:405) in one call; the fixed code (if any) is
    shared across points so curves are comparable.
    """
    from ..parallel.montecarlo import run_simulation

    results = []
    for v in values:
        cfg = dataclasses.replace(base, channel_param=float(v))
        r = run_simulation(cfg, code=code, mesh=mesh)
        if save:
            save_result(r)
        if verbose:
            print(f"{cfg.channel}={v}: trials={r.num_trials} "
                  f"FER={r.block_error_rate:.4g} "
                  f"BER={r.bit_error_rate:.4g} [{r.stopped_by}]")
        results.append(r)
    return results


def sweep_block_length(base: SimulationConfig, ns: Sequence[int],
                       mesh=None, save: bool = False, code_seed: int = 0,
                       verbose: bool = False) -> List[SimulationResult]:
    """Run at each block length (fresh fixed code per n, deterministic by
    code_seed) -- the BER-vs-n study (tools/plotting.py:115-167)."""
    import jax

    from ..parallel.montecarlo import run_simulation

    results = []
    for n in ns:
        cfg = dataclasses.replace(base, n=int(n))
        code = None
        if cfg.code_mode == "fixed" or cfg.decoder == "peeling":
            code = sample_code(
                jax.random.fold_in(jax.random.key(code_seed), n),
                cfg.n, cfg.dv, cfg.dc, cfg.sampler)
        r = run_simulation(cfg, code=code, mesh=mesh)
        if save:
            save_result(r)
        if verbose:
            print(f"n={n}: trials={r.num_trials} "
                  f"FER={r.block_error_rate:.4g} "
                  f"BER={r.bit_error_rate:.4g} [{r.stopped_by}]")
        results.append(r)
    return results


def concentration_study(base: SimulationConfig, code_numbers: Iterable[int],
                        mesh=None, save: bool = False
                        ) -> List[SimulationResult]:
    """Same parameters across several fixed codes (reference codes 1..10,
    tools/combine_data.py:32-62) -- the per-code concentration check."""
    import jax

    from ..parallel.montecarlo import run_simulation

    results = []
    for number in code_numbers:
        cfg = dataclasses.replace(base, code_mode="fixed",
                                  code_number=int(number))
        code_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
            cfg.dv * 1000 + cfg.dc)
        code = sample_code(code_key, cfg.n, cfg.dv, cfg.dc, cfg.sampler)
        r = run_simulation(cfg, code=code, mesh=mesh)
        if save:
            save_result(r)
        results.append(r)
    return results
