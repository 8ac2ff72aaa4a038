"""Transport-agnostic federated messaging types.

Shaped after Flower's FitIns/FitRes/EvaluateIns/EvaluateRes so that a real
cross-site transport (gRPC or the bundled TCP transport in
``fedicra_tpu.federation.transport``) can be slotted under the same server
loop that drives the in-process mesh simulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

Payload = Any  # pytree of arrays: {'params': ..., 'batch_stats': ...}


@dataclass
class FitIns:
    payload: Payload
    config: Dict[str, Any] = field(default_factory=dict)


@dataclass
class FitRes:
    payload: Payload
    num_examples: int  # reference quirk: batch count, not sample count
    metrics: Dict[str, Any] = field(default_factory=dict)
    fit_duration: float = 0.0


@dataclass
class EvaluateIns:
    payload: Payload
    config: Dict[str, Any] = field(default_factory=dict)


@dataclass
class EvaluateRes:
    loss: float
    num_examples: int
    metrics: Dict[str, Any] = field(default_factory=dict)
