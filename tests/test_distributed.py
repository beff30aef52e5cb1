"""Multi-host (jax.distributed) integration tests.

Launches a real 2-process ``jax.distributed`` job on the CPU backend
(coordinator on localhost) running one psum'd Monte Carlo simulation over
the 2-device global mesh, and checks:

  * both processes join, agree on every psum'd counter, and stop together;
  * only process 0 writes the result file (the collective replacement for
    the reference's offline shard merge, tools/combine_data.py:32-95);
  * the counters equal -- exactly -- a single-process run over a 2-device
    virtual mesh with the same config (same fold_in(key, axis_index)
    seeding, so the process boundary must be invisible).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import pytest

from iib_project_ldpc_codes_tpu.models.ensemble import code_for_config
from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

ARGV = ["0.45", "128", "20", "96", "3", "6", "3", "7"]  # mode 3: fixed BP


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(port: int, pid: int, outdir: str) -> subprocess.Popen:
    cmd = [sys.executable, "-m",
           "iib_project_ldpc_codes_tpu.parallel.multihost",
           f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
           f"--process-id={pid}", "--platform=cpu", "--cpu-devices=1",
           f"--output-dir={outdir}"] + ARGV
    env = dict(os.environ)
    # the workers manage their own device counts; drop the test harness's
    # 8-virtual-device forcing so each process contributes exactly 1 device
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


@pytest.fixture(scope="module")
def two_process_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    procs = [_launch(port, pid, outdir) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-3000:]
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    return outs, outdir


def test_two_processes_join_and_agree(two_process_outputs):
    outs, _ = two_process_outputs
    by_pid = {o["process_index"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["distributed"] is True
        assert o["process_count"] == 2
        assert o["mesh_devices"] == 2
    a, b = by_pid[0], by_pid[1]
    assert a["num_trials"] == b["num_trials"]
    assert a["block_errors"] == b["block_errors"]
    assert a["bit_errors"] == b["bit_errors"]
    assert a["error_counts_per_iteration"] == \
        b["error_counts_per_iteration"]
    assert a["stopped_by"] == b["stopped_by"]


def test_primary_only_writer(two_process_outputs):
    outs, outdir = two_process_outputs
    by_pid = {o["process_index"]: o for o in outs}
    assert by_pid[0]["is_primary"] and by_pid[0]["wrote"]
    assert not by_pid[1]["is_primary"] and by_pid[1]["wrote"] is None
    files = os.listdir(outdir)
    assert len(files) == 1  # exactly one result written


def test_checkpoint_resume_broadcast(tmp_path):
    """Host-local checkpoints must not desynchronise a resumed job.

    Process 0 has a checkpoint (recording the whole run as already done);
    process 1's checkpoint path does not exist.  Process 0's state is
    broadcast (montecarlo.py), so BOTH processes must skip the loop and
    agree; without the broadcast process 1 would enter the psum'd chunk
    that process 0 never joins and the job would hang until the timeout.
    """
    iterations, batch = int(ARGV[2]), 1024
    # NB mode 3 argv[7] is the code_number; cfg.seed stays at its default
    ck = dict(seed=0, batch=batch, trials=batch, chunk_idx=1,
              error_totals=[0] * (iterations + 1), block_errors=0,
              bit_errors=0, excluded=0, bit_errors_sq=0.0)
    ck_path0 = tmp_path / "ck0.json"
    ck_path0.write_text(json.dumps(ck))
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    port = _free_port()
    procs = []
    for pid in (0, 1):
        ck_path = str(ck_path0) if pid == 0 else str(tmp_path / "absent.json")
        cmd = [sys.executable, "-m",
               "iib_project_ldpc_codes_tpu.parallel.multihost",
               f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
               f"--process-id={pid}", "--platform=cpu", "--cpu-devices=1",
               f"--output-dir={outdir}",
               f"--checkpoint-path={ck_path}"] + ARGV
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-3000:]
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    by_pid = {o["process_index"]: o for o in outs}
    # both resumed at trials=batch >= num_tests: no chunks run anywhere
    for o in outs:
        assert o["num_trials"] == batch
        assert o["block_errors"] == 0
        assert o["stopped_by"] == "num_tests"
    assert by_pid[0]["num_trials"] == by_pid[1]["num_trials"]


def test_matches_single_process_mesh_exactly(two_process_outputs):
    """Cross-process psum == in-process 2-virtual-device mesh, exactly."""
    outs, _ = two_process_outputs
    got = outs[0]
    cfg = SimulationConfig.from_reference_argv(ARGV)
    code = code_for_config(cfg)
    mesh = make_mesh(jax.devices()[:2])
    want = run_simulation(cfg, code=code, mesh=mesh)
    assert got["num_trials"] == want.num_trials
    assert got["block_errors"] == want.block_errors
    assert got["bit_errors"] == want.bit_errors
    assert got["error_counts_per_iteration"] == \
        want.error_counts_per_iteration


def test_two_process_irregular_matches_mesh(tmp_path):
    """A real 2-process job on the irregular ensemble agrees across
    processes and equals a single-process 2-device-mesh run exactly."""
    cfg = SimulationConfig(
        channel="BEC", channel_param=0.45, n=96,
        lam=[0, 1 / 3, 0, 2 / 3], rho=[0, 0, 0, 0, 0, 1.0],
        decoder="bp", iterations=20, num_tests=128, batch=64,
        max_block_errors=10**9, seed=7, code_mode="ensemble")
    cfg_path = tmp_path / "irr.json"
    cfg_path.write_text(cfg.to_json())
    outdir = str(tmp_path / "out")
    port = _free_port()
    procs = []
    for pid in (0, 1):
        cmd = [sys.executable, "-m",
               "iib_project_ldpc_codes_tpu.parallel.multihost",
               f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
               f"--process-id={pid}", "--platform=cpu", "--cpu-devices=1",
               f"--output-dir={outdir}", f"--config={cfg_path}"]
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-3000:]
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    a, b = outs
    assert a["block_errors"] == b["block_errors"]
    assert a["bit_errors"] == b["bit_errors"]

    # single process, 2-device virtual mesh, same config: exact equality
    local = run_simulation(cfg, mesh=make_mesh(jax.devices()[:2]))
    assert local.block_errors == a["block_errors"]
    assert local.bit_errors == a["bit_errors"]
    assert local.error_counts_per_iteration == \
        a["error_counts_per_iteration"]
