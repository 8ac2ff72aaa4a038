from .config import CENTRALIZED_FL, PERSONALIZED_FL, TASKS, TrainConfig
from .trainer import ClientState, init_client_state, make_round_fn, poly_lr

__all__ = [
    "CENTRALIZED_FL",
    "PERSONALIZED_FL",
    "TASKS",
    "TrainConfig",
    "ClientState",
    "init_client_state",
    "make_round_fn",
    "poly_lr",
]
