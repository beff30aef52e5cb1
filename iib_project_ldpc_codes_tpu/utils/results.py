"""Structured results IO + legacy CSV compatibility.

The reference's metrics system is the filesystem: CSVs whose *filenames*
encode all run parameters as ``key=value`` segments
(parallel_simulator.py:250-269) and whose rows are per-iteration average bit
erasure rates followed by labelled summary rows (parallel_simulator.py:26-42).
Downstream tools parse parameters back out of filenames
(tools/combine_data.py:15-27) and hardcode CSV line numbers -- fragile.

Here the primary format is a JSON document with explicit metadata; the
legacy CSV format (identical schema and filename encoding) is kept as an
optional writer/reader so reference post-processing workflows keep working.
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import datetime
from typing import List, Optional

from .config import SimulationConfig


@dataclasses.dataclass
class SimulationResult:
    config: SimulationConfig
    num_trials: int
    # Average bit erasure rate after each BP iteration (length iterations+1,
    # index 0 = channel erasure rate), averaged over *all* trials
    # (parallel_simulator.py:248).
    error_rate_per_iteration: List[float]
    block_error_rate: float
    bit_error_rate: float
    optimal_block_error_rate: Optional[float] = None
    optimal_bit_error_rate: Optional[float] = None
    # Raw counts, so shards can be re-reduced without rounding
    # (tools/combine_data.py re-derives counts by round(rate*num*n) -- we
    # just keep them).
    block_errors: int = 0
    bit_errors: int = 0
    optimal_block_errors: Optional[int] = None
    optimal_bit_errors: Optional[int] = None
    error_counts_per_iteration: Optional[List[int]] = None
    excluded_trials: int = 0  # expurgation-gated trials
    # Sum of squared per-trial final error counts (block-level second
    # moment), feeding the empirical-variance BER CI (utils.stats.ber_ci).
    bit_errors_sq: Optional[float] = None
    # Ensemble mode only: sum over fresh codes of (per-code total bit
    # errors)^2 and the (uniform) trials-per-code cluster size.  Trials
    # sharing a code are positively correlated; ber_ci uses this cluster
    # second moment so the ensemble-mode interval is not anti-conservative.
    code_bit_errors_sq: Optional[float] = None
    trials_per_code: Optional[int] = None
    elapsed_seconds: float = 0.0
    timestamp: str = ""
    stopped_by: str = ""  # "num_tests" | "block_errors" | "wall_clock"

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["config"] = dataclasses.asdict(self.config)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "SimulationResult":
        d = json.loads(s)
        d["config"] = SimulationConfig(**d["config"])
        return cls(**d)


# ---------------------------------------------------------------------------
# Filename codec (parallel_simulator.py:250-260 / tools/combine_data.py:15-27)
# ---------------------------------------------------------------------------

def encode_filename(result: SimulationResult, extension: str = ".json") -> str:
    cfg = result.config
    irregular = cfg.lam is not None
    parts = ["irregular_code" if irregular else "regular_code"]
    if cfg.expurgation is not None:
        parts[0] += f"_expurgated={cfg.expurgation}"
    if cfg.code_mode == "fixed":
        parts.append(f"code_number={cfg.code_number}")
    parts.append(f"{cfg.channel}={cfg.channel_param}")
    parts.append(f"n={cfg.n}")
    parts.append(f"k={cfg.k}")
    if irregular:
        # degree distributions live in the JSON config; the filename
        # carries the maximum degrees for human scanning
        parts.append(f"dvmax={len(cfg.lam)}")
        parts.append(f"dcmax={len(cfg.rho)}")
    else:
        parts.append(f"dv={cfg.dv}")
        parts.append(f"dc={cfg.dc}")
    if result.config.decoder in ("bp", "both"):
        parts.append(f"it={cfg.iterations}")
    parts.append(f"num={result.num_trials}")
    parts.append(f"seed={cfg.seed}")
    stamp = result.timestamp or datetime.now().strftime("%d-%m-%Y-%H-%M-%S")
    parts.append(f"time={stamp}")
    return "_".join(parts) + extension


def decode_filename(filename: str) -> dict:
    """Parse ``key=value`` filename segments (tools/combine_data.py:15-27)."""
    base = os.path.basename(filename)
    for ext in (".json", ".csv"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    params = {}
    for seg in base.split("_"):
        if "=" in seg:
            k, v = seg.split("=", 1)
            params[k] = v
    return params


# ---------------------------------------------------------------------------
# Writers / readers
# ---------------------------------------------------------------------------

def save_result(result: SimulationResult, directory: Optional[str] = None
                ) -> str:
    directory = directory or result.config.output_dir
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, encode_filename(result))
    with open(path, "w") as f:
        f.write(result.to_json())
    if result.config.write_legacy_csv:
        write_legacy_csv(result, directory)
    return path


def load_result(path: str) -> SimulationResult:
    with open(path) as f:
        return SimulationResult.from_json(f.read())


def write_legacy_csv(result: SimulationResult, directory: str) -> str:
    """Reference CSV schema (parallel_simulator.py:26-42).

    Rows 1..it+1: per-iteration average bit erasure rate; then labelled
    rows 'Message passing block-wise error', 'Message passing bit-wise
    error', and (if the ML decoder ran) the two 'Optimal decoding ...' rows.
    """
    import csv

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, encode_filename(result, ".csv"))
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        if result.config.decoder in ("bp", "both"):
            for r in result.error_rate_per_iteration:
                w.writerow([r])
            w.writerow(["Message passing block-wise error",
                        result.block_error_rate])
            w.writerow(["Message passing bit-wise error",
                        result.bit_error_rate])
        if result.optimal_block_error_rate is not None:
            w.writerow(["Optimal decoding block-wise error",
                        result.optimal_block_error_rate])
            w.writerow(["Optimal decoding bit-wise error",
                        result.optimal_bit_error_rate])
    return path


def result_from_legacy_csv(path: str) -> SimulationResult:
    """Ingest a CSV written by the *reference's own* writers into a
    :class:`SimulationResult`, so reference shards combine through
    :func:`..combine.combine_results` alongside native JSON shards.

    Counts are reconstructed by the reference's own reduction rule
    ``round(rate * num * n)`` (tools/combine_data.py:49) -- exact for
    rates that are integer ratios at these magnitudes.  Handles all
    three writer layouts (parallel_simulator.py:20-42): message-passing,
    optimal-only, and combined; fixed-code filenames are recognised by
    the reference filename codec's ``number`` key (the reference's own
    parser splits ``code_number=3`` into ``number=3`` the same way,
    tools/combine_data.py:17-23).
    """
    parsed = read_legacy_csv(path)
    params = decode_filename(path)
    n = int(params["n"])
    num = int(params["num"])
    curve = parsed["error_rate_per_iteration"]
    mp_block = parsed.get("Message passing block-wise error")
    mp_bit = parsed.get("Message passing bit-wise error")
    opt_block = parsed.get("Optimal decoding block-wise error")
    opt_bit = parsed.get("Optimal decoding bit-wise error")
    if mp_block is not None and opt_block is not None:
        decoder = "both"
    elif opt_block is not None:
        decoder = "ml"
    else:
        decoder = "bp"
    cfg = SimulationConfig(
        channel="BEC", channel_param=float(params.get("BEC", 0.0)),
        n=n, dv=int(params.get("dv", 3)), dc=int(params.get("dc", 6)),
        decoder=decoder,
        iterations=int(params.get("it", max(len(curve) - 1, 0))),
        num_tests=num,
        code_mode="fixed" if "number" in params else "ensemble",
        code_number=int(params.get("number", 1)),
        # the reference's expurgated writer prefixes the filename with
        # 'regular_code_expurgated=<s>' (parallel_simulator_expurgated
        # .py:262-265); 'expurgation' is a merge key, so dropping it
        # would let expurgated and raw shards silently combine
        expurgation=(int(params["expurgated"])
                     if "expurgated" in params else None))
    return SimulationResult(
        config=cfg, num_trials=num,
        error_rate_per_iteration=curve,
        block_error_rate=mp_block if mp_block is not None else 0.0,
        bit_error_rate=mp_bit if mp_bit is not None else 0.0,
        optimal_block_error_rate=opt_block,
        optimal_bit_error_rate=opt_bit,
        block_errors=round((mp_block or 0.0) * num),
        bit_errors=round((mp_bit or 0.0) * num * n),
        optimal_block_errors=(round(opt_block * num)
                              if opt_block is not None else None),
        optimal_bit_errors=(round(opt_bit * num * n)
                            if opt_bit is not None else None),
        error_counts_per_iteration=(
            [round(r * num * n) for r in curve] if curve else None),
        timestamp=params.get("time", ""),
        stopped_by="legacy_csv")


def read_legacy_csv(path: str) -> dict:
    """Read a reference-format CSV back into a dict of curves + summaries."""
    import csv

    curve, summary = [], {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row:
                continue
            if len(row) == 1:
                curve.append(float(row[0]))
            else:
                summary[row[0]] = float(row[1])
    out = dict(summary)
    out["error_rate_per_iteration"] = curve
    out.update(decode_filename(path))
    return out
