"""Transport failure paths: dropped client, timeouts, malformed payloads.

Proves the abort semantics match the reference's accept_failures=False
contract (..._Ours.py:377; flower_common.py:263-265): a failed client aborts
the round's aggregation — the global weights are untouched — and the server
loop continues with the next round.
"""

import socket
import threading
import time

import numpy as np
import pytest

from fedicra_tpu.federation.api import EvaluateRes, FitIns, FitRes
from fedicra_tpu.federation.server import FederatedServer
from fedicra_tpu.federation.strategies import get_strategy
from fedicra_tpu.federation.transport import (
    accept_clients,
    recv_msg,
    send_msg,
    serve_client,
)


class _Cfg:
    iters = 5
    eval_iters = 1000  # never evaluates in these tests
    batch_size = 2
    max_iterations = 10
    num_classes = 3


class _FlakyClient:
    """Serves fits normally until ``die_at_fit``, then closes the socket
    mid-round (simulating a crashed client process)."""

    def __init__(self, cid, die_at_fit=None):
        self.cid = cid
        self.num_batches = 2
        self.fit_calls = 0
        self.die_at_fit = die_at_fit

    def fit(self, ins):
        self.fit_calls += 1
        if self.die_at_fit is not None and self.fit_calls >= self.die_at_fit:
            raise SystemExit  # kills the serve_client thread, closing the socket
        payload = {
            "params": {"w": np.asarray(ins.payload["params"]["w"]) + 1.0},
            "batch_stats": {},
        }
        return FitRes(payload=payload, num_examples=self.num_batches,
                      metrics={f"client_{self.cid}_total_loss": 0.5},
                      fit_duration=0.01)

    def evaluate(self, ins):
        return EvaluateRes(loss=0.0, num_examples=1, metrics={})


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(clients, port):
    def run(c):
        try:
            serve_client(c, "127.0.0.1", port)
        except (SystemExit, ConnectionError, OSError):
            pass

    threads = [threading.Thread(target=run, args=(c,), daemon=True) for c in clients]
    for t in threads:
        t.start()
    return threads


def test_dropped_client_aborts_round_and_server_continues():
    port = _free_port()
    clients = [_FlakyClient(0), _FlakyClient(1, die_at_fit=2)]
    _spawn(clients, port)
    proxies = accept_clients("127.0.0.1", port, 2, timeout=30)

    payload = {"params": {"w": np.zeros((4,), np.float32)}, "batch_stats": {}}
    server = FederatedServer(
        _Cfg(), proxies, get_strategy("FedAvg"), payload
    )
    history = server.run(num_rounds=10)

    # round 1 (iters=5 -> round index 5) aggregated: w == 1
    np.testing.assert_allclose(
        np.asarray(server.global_payload["params"]["w"]), 1.0
    )
    # round 2 (index 10): client 1 died mid-round -> aborted, w unchanged
    aborted = [h for h in history if h.get("aborted")]
    assert len(aborted) == 1 and aborted[0]["round"] == 10, history
    ok = [h for h in history if not h.get("aborted")]
    assert len(ok) == 1 and ok[0]["round"] == 5


def test_accept_clients_connect_timeout():
    port = _free_port()
    t0 = time.perf_counter()
    with pytest.raises(OSError):  # socket.timeout is a subclass
        accept_clients("127.0.0.1", port, expected=1, timeout=0.5)
    assert time.perf_counter() - t0 < 10


def test_round_timeout_on_hung_client():
    """A client that stops responding trips the per-round timeout."""

    class _HangingClient(_FlakyClient):
        def fit(self, ins):
            time.sleep(30)
            return super().fit(ins)

    port = _free_port()
    _spawn([_HangingClient(0)], port)
    (proxy,) = accept_clients("127.0.0.1", port, 1, timeout=30)
    proxy.round_timeout = 0.5
    with pytest.raises(OSError):
        proxy.fit(
            FitIns({"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}}, {})
        )


def test_timed_out_proxy_never_consumes_stale_reply():
    """After a round_timeout fires mid-fit, the late reply must not be
    delivered to the NEXT round (previously the socket was reused and every
    subsequent round silently aggregated one-round-stale results). The proxy
    is dead: later calls fail fast instead of desynchronizing."""

    class _SlowThenFastClient(_FlakyClient):
        def fit(self, ins):
            self.fit_calls += 1
            if self.fit_calls == 1:
                time.sleep(1.5)  # exceeds the round timeout; reply arrives late
            payload = {
                "params": {"w": np.asarray(ins.payload["params"]["w"]) + 1.0},
                "batch_stats": {},
            }
            return FitRes(payload=payload, num_examples=2,
                          metrics={}, fit_duration=0.01)

    port = _free_port()
    _spawn([_SlowThenFastClient(0)], port)
    (proxy,) = accept_clients("127.0.0.1", port, 1, timeout=30)
    proxy.round_timeout = 0.3
    ins = FitIns({"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}}, {})
    with pytest.raises(OSError):
        proxy.fit(ins)
    assert proxy.dead
    time.sleep(1.5)  # the late fit_res for seq 1 is now sitting in flight
    with pytest.raises(ConnectionError, match="dead"):
        proxy.fit(ins)  # must NOT return the stale seq-1 result


def test_malformed_length_header_rejected():
    a, b = socket.socketpair()
    try:
        # forge an absurd length header (pretend 2**60-byte payload)
        a.sendall((2**60).to_bytes(8, "big") + b"garbage")
        with pytest.raises(ConnectionError, match="malformed"):
            recv_msg(b)
    finally:
        a.close()
        b.close()


def test_truncated_payload_rejected():
    a, b = socket.socketpair()
    try:
        send_msg(a, ("fit", {"x": np.ones(4)}, {}))
        # eat the valid message, then send a header promising more bytes
        # than ever arrive before closing
        recv_msg(b)
        a.sendall((1024).to_bytes(8, "big") + b"short")
        a.close()
        with pytest.raises(ConnectionError, match="closed"):
            recv_msg(b)
    finally:
        b.close()
