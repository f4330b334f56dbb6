"""Multi-PROCESS distributed tests (T8): two independent XLA CPU clients
joined by jax.distributed, collectives over the cross-process Gloo
transport -- the closest this one-box environment gets to multi-host DCN
(SURVEY.md SS3b T8; VERDICT r2 SS6 'DCN unexercised').

These spawn REAL subprocesses via benchmarks/multiproc_sim.py (the in-pytest
jax runtime is already single-process-initialized and cannot join a
cluster), so they are the slowest tests in the suite.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "benchmarks", "multiproc_sim.py")


def run_sim(*extra, timeout=900):
    env = dict(os.environ)
    # The workers pin their own platform/device-count; drop the pytest
    # conftest's 8-device flag so each worker's --local-devices wins.
    env.pop("XLA_FLAGS", None)
    # Inner launcher timeout < outer timeout: on a worker hang the
    # launcher must get to kill the workers and print their output tails
    # before pytest's own TimeoutExpired cuts everything off.
    out = subprocess.run(
        [sys.executable, DRIVER, "--n", "512", "--k", "8",
         "--local-devices", "2", "--trunc", "64", "--timeout", "600",
         *extra],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert out.returncode == 0, f"stdout:\n{out.stdout[-4000:]}"
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_two_process_sharded_hybrid_matches_scipy():
    rep = run_sim()
    assert rep["ok"] is True
    assert rep["nproc"] == 2 and rep["n_shards"] == 4
    assert rep["obj"] == rep["scipy_obj"]


@pytest.mark.slow
def test_two_process_overlap_and_balanced_ladder():
    rep = run_sim("--overlap", "--ladder-balance")
    assert rep["ok"] is True
    assert rep["overlap"] is True and rep["ladder_balance"] is True
    assert rep["obj"] == rep["scipy_obj"]


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["sharded", "overlapped"])
def test_two_process_fullwidth_backends(backend):
    rep = run_sim("--backend", backend, "--n", "256")
    assert rep["ok"] is True
    assert rep["backend"] == backend
    assert rep["obj"] == rep["scipy_obj"]


@pytest.mark.slow
def test_two_process_batched_dp():
    rep = run_sim("--backend", "batched", "--n", "128")
    assert rep["ok"] is True
    assert rep["objs_match"] == rep["B"]
