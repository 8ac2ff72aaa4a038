"""TCP transport smoke test: server round trip with a fake client."""

import socket
import threading

import numpy as np

from fedicra_tpu.federation.api import EvaluateIns, FitIns
from fedicra_tpu.federation.transport import (
    RemoteClientProxy,
    accept_clients,
    recv_msg,
    send_msg,
    serve_client,
)


class _FakeClient:
    def __init__(self, cid):
        self.cid = cid
        self.num_batches = 3

    def fit(self, ins):
        from fedicra_tpu.federation.api import FitRes

        payload = {"params": {"w": np.asarray(ins.payload["params"]["w"]) + 1}}
        return FitRes(payload=payload, num_examples=self.num_batches,
                      metrics={"loss": 0.5}, fit_duration=0.01)

    def evaluate(self, ins):
        from fedicra_tpu.federation.api import EvaluateRes

        return EvaluateRes(loss=0.0, num_examples=2,
                           metrics={f"client_{self.cid}_val_mean_dice": 0.9})


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_transport_round_trip():
    port = _free_port()
    clients = [_FakeClient(0), _FakeClient(1)]
    threads = [
        threading.Thread(target=serve_client, args=(c, "127.0.0.1", port))
        for c in clients
    ]
    for t in threads:
        t.start()
    proxies = accept_clients("127.0.0.1", port, 2, timeout=30)
    assert [p.cid for p in proxies] == [0, 1]
    assert [p.num_batches for p in proxies] == [3, 3]

    payload = {"params": {"w": np.zeros((4,))}}
    for p in proxies:
        res = p.fit(FitIns(payload, {"iter_global": 10}))
        np.testing.assert_allclose(res.payload["params"]["w"], 1.0)
        assert res.num_examples == 3
        ev = p.evaluate(EvaluateIns(payload, {}))
        assert f"client_{p.cid}_val_mean_dice" in ev.metrics
    for p in proxies:
        p.close()
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive()
