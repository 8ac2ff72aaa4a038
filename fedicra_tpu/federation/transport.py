"""Cross-process federation transport (the reference's L9 layer).

The reference federates 6 OS processes over Flower 1.0 gRPC, shipping the
full state_dict as protobuf ndarrays each way every round
(flower_common.py:63-71, 488-489). This module provides the same star
topology over length-prefixed pickled numpy payloads on plain TCP sockets —
dependency-free, and honouring the same FitIns/FitRes shapes as the
in-process simulator, so the FederatedServer round loop is reused unchanged
via ``RemoteClientProxy``.

When to use which:
- single host, 1..N chips: the in-process simulator (zero serialization; the
  aggregation is an on-device reduction) — the TPU-native default;
- multi-host TPU pods: ``jax.distributed.initialize`` + the sharded round
  (federation/sharded.py) over DCN — still no host serialization;
- true cross-site federation (separate trust domains): this transport.
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from .api import EvaluateIns, EvaluateRes, FitIns, FitRes

_LEN = struct.Struct("!Q")

# Payload sanity cap: the round payload is the full model state (a few MB at
# the reference's 1.8M params); anything near this bound is a corrupt or
# malicious length header, and rejecting it up front fails the round fast
# instead of blocking in _recv_exact until the peer times out.
MAX_MSG_BYTES = 4 << 30


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    if len(data) > MAX_MSG_BYTES:
        raise ValueError(f"message of {len(data)} bytes exceeds cap")
    sock.sendall(_LEN.pack(len(data)) + data)


def recv_msg(sock: socket.socket) -> Any:
    header = _recv_exact(sock, _LEN.size)
    (length,) = _LEN.unpack(header)
    if length > MAX_MSG_BYTES:
        raise ConnectionError(
            f"malformed message header: length {length} exceeds cap"
        )
    return pickle.loads(_recv_exact(sock, length))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("socket closed")
        buf.extend(chunk)
    return bytes(buf)


class RemoteClientProxy:
    """Server-side handle implementing the FederatedClient interface over a
    socket (fit / evaluate / num_batches)."""

    def __init__(
        self,
        sock: socket.socket,
        cid: int,
        num_batches: int,
        round_timeout: Optional[float] = None,
    ):
        self.sock = sock
        self.cid = cid
        self.num_batches = num_batches
        self.round_timeout = round_timeout  # None = wait forever (reference
        # parity: round_timeout=None, ..._Ours.py:405)
        self.state = None  # remote; not introspectable
        self.dead = False
        self._seq = 0  # request/reply correlation id

    def _request(self, req: tuple, expected_kind: str) -> tuple:
        """One request/reply exchange. Any failure — timeout mid-round,
        partial read, mismatched seq — permanently kills the proxy: a
        timed-out request leaves the late reply in flight, so reusing the
        socket would deliver round N's result to round N+1 (silently stale
        aggregation) and a timeout inside _recv_exact additionally
        desynchronizes the length-prefixed framing."""
        if self.dead:
            raise ConnectionError(
                f"client {self.cid} proxy is dead (previous round failed)"
            )
        self._seq += 1
        try:
            self.sock.settimeout(self.round_timeout)
            send_msg(self.sock, (req[0], self._seq, *req[1:]))
            reply = recv_msg(self.sock)
        except Exception:
            self.dead = True
            try:
                self.sock.close()
            except OSError:
                pass
            raise
        kind, seq = reply[0], reply[1]
        if kind != expected_kind or seq != self._seq:
            self.dead = True
            self.sock.close()
            raise ConnectionError(
                f"unexpected reply ({kind!r}, seq {seq}) to "
                f"{req[0]!r} seq {self._seq} from client {self.cid}"
            )
        return reply[2:]

    def fit(self, ins: FitIns) -> FitRes:
        payload, num, metrics, dur = self._request(
            ("fit", _tree_to_numpy(ins.payload), ins.config), "fit_res"
        )
        return FitRes(payload=payload, num_examples=num, metrics=metrics,
                      fit_duration=dur)

    def evaluate(self, ins: EvaluateIns) -> EvaluateRes:
        loss, num, metrics = self._request(
            ("evaluate", _tree_to_numpy(ins.payload), ins.config),
            "evaluate_res",
        )
        return EvaluateRes(loss=loss, num_examples=num, metrics=metrics)

    def close(self):
        try:
            if not self.dead:
                send_msg(self.sock, ("shutdown", 0))
        except Exception:
            pass
        self.sock.close()


def accept_clients(
    host: str, port: int, expected: int, timeout: float = 300.0
) -> List[RemoteClientProxy]:
    """Listen until ``expected`` clients register (cid + batch count)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(expected)
    srv.settimeout(timeout)
    proxies: Dict[int, RemoteClientProxy] = {}
    while len(proxies) < expected:
        sock, _ = srv.accept()
        kind, cid, num_batches = recv_msg(sock)
        assert kind == "register"
        proxies[cid] = RemoteClientProxy(sock, cid, num_batches)
    srv.close()
    return [proxies[c] for c in sorted(proxies)]


def serve_client(client, host: str, port: int, retries: int = 60) -> None:
    """Client-side loop: register, then answer fit/evaluate until shutdown.

    ``client`` is a FederatedClient (federation/client.py).
    """
    import time

    sock = None
    for _ in range(retries):
        try:
            sock = socket.create_connection((host, port), timeout=10)
            break
        except OSError:
            time.sleep(1.0)
    if sock is None:
        raise ConnectionError(f"could not reach server at {host}:{port}")

    send_msg(sock, ("register", client.cid, client.num_batches))
    while True:
        msg = recv_msg(sock)
        if msg[0] == "shutdown":
            break
        if msg[0] == "fit":
            _, seq, payload, config = msg
            res = client.fit(FitIns(payload, config))
            send_msg(
                sock,
                (
                    "fit_res",
                    seq,
                    _tree_to_numpy(res.payload),
                    res.num_examples,
                    res.metrics,
                    res.fit_duration,
                ),
            )
        elif msg[0] == "evaluate":
            _, seq, payload, config = msg
            res = client.evaluate(EvaluateIns(payload, config))
            send_msg(
                sock,
                ("evaluate_res", seq, res.loss, res.num_examples, res.metrics),
            )
    sock.close()
