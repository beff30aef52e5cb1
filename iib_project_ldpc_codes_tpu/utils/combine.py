"""Shard reducer: merge per-shard simulation results.

The reference reduces HPC array-job shards offline by parsing parameters
out of CSV filenames and re-aggregating normalised rates back into counts
(``round(rate*num*n)``, tools/combine_data.py:32-95).  Here shards carry
raw counts in structured JSON, so reduction is exact integer addition --
and inside a single multi-chip run it never happens at all (the psum in
parallel/montecarlo.py already did it).  This module covers the
*cross-run* case: merging results from separate invocations (more seeds,
resumed sweeps), replacing all five combine_data.py variants.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .results import SimulationResult, load_result, save_result

#: config fields that must agree for shards to be mergeable
MERGE_KEYS = ("channel", "channel_param", "n", "dv", "dc", "decoder",
              "iterations", "code_mode", "code_number", "expurgation",
              "lam", "rho")


def merge_key(result: SimulationResult) -> Tuple:
    cfg = result.config
    vals = []
    for k in MERGE_KEYS:
        v = getattr(cfg, k)
        if k == "iterations" and cfg.decoder == "ml":
            # the ML decoder has no iteration budget (no per-iteration
            # series either); reference optimal-only CSVs carry no 'it='
            # segment, so pinning it would block merging them with
            # native ml shards over a meaningless field
            v = None
        vals.append(tuple(v) if isinstance(v, list) else v)
    return tuple(vals)


def combine_results(results: Sequence[SimulationResult]) -> SimulationResult:
    """Exact count-level reduction of shards with identical parameters."""
    if not results:
        raise ValueError("no results to combine")
    key0 = merge_key(results[0])
    for r in results[1:]:
        if merge_key(r) != key0:
            raise ValueError(
                f"cannot combine mismatched shards: {merge_key(r)} != {key0}")
    cfg = dataclasses.replace(results[0].config)
    trials = sum(r.num_trials for r in results)
    n = cfg.n
    block_errors = sum(r.block_errors for r in results)
    bit_errors = sum(r.bit_errors for r in results)
    excluded = sum(r.excluded_trials for r in results)

    counts = None
    for r in results:
        if r.error_counts_per_iteration is not None:
            c = np.asarray(r.error_counts_per_iteration, np.int64)
        elif r.error_rate_per_iteration:
            # legacy-style reconstruction (tools/combine_data.py:49)
            c = np.round(np.asarray(r.error_rate_per_iteration)
                         * r.num_trials * n).astype(np.int64)
        else:
            c = None
        if c is not None:
            counts = c if counts is None else counts + c

    has_opt = any(r.optimal_block_errors is not None for r in results)
    opt_block = sum(r.optimal_block_errors or 0 for r in results) \
        if has_opt else None
    opt_bit = sum(r.optimal_bit_errors or 0 for r in results) \
        if has_opt else None

    # second moments are sums over trials/codes: exactly mergeable when
    # every shard carries them (and, for the cluster moment, the cluster
    # size agrees)
    sq = (sum(r.bit_errors_sq for r in results)
          if all(r.bit_errors_sq is not None for r in results) else None)
    tpcs = {r.trials_per_code for r in results}
    tpc = tpcs.pop() if len(tpcs) == 1 else None
    code_sq = (sum(r.code_bit_errors_sq for r in results)
               if tpc is not None
               and all(r.code_bit_errors_sq is not None for r in results)
               else None)

    return SimulationResult(
        config=cfg,
        num_trials=trials,
        error_rate_per_iteration=(
            (counts / (n * trials)).tolist() if counts is not None else []),
        block_error_rate=block_errors / trials,
        bit_error_rate=bit_errors / (n * trials),
        optimal_block_error_rate=(opt_block / trials) if has_opt else None,
        optimal_bit_error_rate=(opt_bit / (n * trials)) if has_opt else None,
        block_errors=block_errors,
        bit_errors=bit_errors,
        optimal_block_errors=opt_block,
        optimal_bit_errors=opt_bit,
        error_counts_per_iteration=(
            counts.tolist() if counts is not None else None),
        excluded_trials=excluded,
        bit_errors_sq=sq,
        code_bit_errors_sq=code_sq,
        trials_per_code=tpc,
        elapsed_seconds=sum(r.elapsed_seconds for r in results),
        timestamp=max(r.timestamp for r in results),
        stopped_by="combined",
    )


def combine_directory(directory: str, output_directory: str | None = None
                      ) -> List[SimulationResult]:
    """Group all shard JSONs in a directory by parameters and reduce.

    The directory-walk equivalent of tools/combine_data.py's five variants
    (per-code concentration grouping falls out of code_number being a merge
    key).  Writes one combined result per group when ``output_directory``
    is given; returns the combined results either way.
    """
    groups: Dict[Tuple, List[SimulationResult]] = {}
    for name in sorted(os.listdir(directory)):
        if not name.endswith(".json"):
            continue
        r = load_result(os.path.join(directory, name))
        groups.setdefault(merge_key(r), []).append(r)
    combined = [combine_results(rs) for rs in groups.values()]
    if output_directory:
        os.makedirs(output_directory, exist_ok=True)
        for r in combined:
            save_result(r, output_directory)
    return combined
