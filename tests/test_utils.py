"""Checkpoint/warm-start and observability subsystem tests (SURVEY.md SS6)."""

import numpy as np
import jax.numpy as jnp

from sslap_tpu import AuctionSolver, auction_solve, ingest
from sslap_tpu import auction as _auction
from sslap_tpu.utils import load_state, save_state
from sslap_tpu.utils.profiling import throughput_counters


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    C = rng.integers(0, 100, (24, 24))
    s = AuctionSolver(C)
    res = s.solve()
    p = tmp_path / "state.npz"
    save_state(p, s.prices, eps=res["meta"]["final_eps"],
               rounds=res["meta"]["its"], extra={"tag": "t"})
    prices, meta = load_state(p)
    np.testing.assert_array_equal(prices, s.prices)
    assert meta["eps"] == res["meta"]["final_eps"]
    assert meta["extra"]["tag"] == "t"
    # restored prices warm-start to the same optimum
    res2 = s.solve(warm_prices=prices)
    assert res2["meta"]["obj"] == res["meta"]["obj"]


def test_on_round_callback():
    rng = np.random.default_rng(1)
    C = rng.integers(0, 50, (16, 16))
    prob = ingest.from_dense(C)
    tr = _auction.make_transform("min", prob.m, np.int32, float(C.max()))
    seen = []

    def on_round(r, unassigned, eps):
        seen.append((int(r), int(unassigned), float(eps)))

    res = _auction.solve_ell(
        prob.cols, tr.apply(prob.vals), prob.valid, prob.nvalid,
        jnp.zeros((prob.m,), jnp.int32),
        eps0=500, eps_min=1, theta=5, max_iter=10_000,
        on_round=on_round)
    import jax
    jax.effects_barrier()
    assert len(seen) == int(np.asarray(res.rounds))
    # rounds strictly increase; final round fully assigned
    rounds = [s[0] for s in seen]
    assert rounds == sorted(rounds)
    assert seen[-1][1] == 0


def test_throughput_counters():
    c = throughput_counters(1000, {"time": 2.0, "its": 10})
    assert c["nnz_per_s"] == 5000.0
    assert c["rounds_per_s"] == 5.0


def test_device_alive_machinery(monkeypatch):
    # Exercises the subprocess-probe machinery, not the device: the probe
    # guards against backends that HANG (a dead relay never raises), so
    # it must run out-of-process under a timeout and honor the deadline.
    from sslap_tpu.utils import liveness

    monkeypatch.setattr(liveness, "_PROBE_CODE", "print('ok')")
    assert liveness.device_alive(wait_s=5) is True

    msgs = []
    monkeypatch.setattr(liveness, "_PROBE_CODE",
                        "import sys; sys.exit(1)")
    assert liveness.device_alive(wait_s=0, log=msgs.append) is False
    assert any("unreachable" in m for m in msgs)


def test_relay_tcp_fast_fail(monkeypatch):
    # A relay whose TCP endpoints refuse connects is a FULLY-dead tunnel:
    # device_alive must report dead in seconds without running the (slow,
    # hang-prone) matmul probe at all.
    import socket
    from sslap_tpu.utils import liveness

    # Find a port nothing listens on.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    monkeypatch.setenv("SSLAP_TPU_RELAY_TCP", f"127.0.0.1:{port}")
    assert liveness._relay_definitely_dead() is True
    msgs = []
    # _PROBE_CODE untouched: if the fast-fail path didn't trigger, this
    # would only fail via the generic deadline message.
    assert liveness.device_alive(wait_s=60, log=msgs.append) is False
    assert any("refused" in m for m in msgs)

    # A LISTENING endpoint is ambiguous (half-dead tunnels keep their
    # relay port open) -> must NOT short-circuit.
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    lport = srv.getsockname()[1]
    monkeypatch.setenv("SSLAP_TPU_RELAY_TCP", f"127.0.0.1:{lport}")
    assert liveness._relay_definitely_dead() is False
    srv.close()

    # No endpoints configured and not on a relayed platform -> no signal.
    monkeypatch.delenv("SSLAP_TPU_RELAY_TCP")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert liveness._relay_endpoints() == []
    assert liveness._relay_definitely_dead() is False
