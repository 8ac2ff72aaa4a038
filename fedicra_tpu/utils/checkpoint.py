"""Checkpointing with orbax: best / periodic snapshots + full resume.

The reference only ever saves (server best + every-3000-iter snapshots +
client-side best, flower_common.py:341-381); nothing can resume. Here the
server state (global payload + every client's ClientState + round index) is
a single orbax composite so training can restart mid-run.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if _HAVE_ORBAX else None

    def _save(self, name: str, tree: Any):
        path = os.path.join(self.directory, name)
        if self._ckptr is not None:
            self._ckptr.save(path, _to_numpy(tree), force=True)
            self._ckptr.wait_until_finished()
        else:  # flat npz fallback
            from flax import traverse_util

            flat = traverse_util.flatten_dict(tree, sep="/")
            np.savez(path + ".npz", **{k: np.asarray(v) for k, v in flat.items()})

    def _restore(self, name: str, target: Any) -> Any:
        path = os.path.join(self.directory, name)
        if self._ckptr is not None and os.path.exists(path):
            return self._ckptr.restore(path, target=_to_numpy(target))
        raise FileNotFoundError(path)

    def save_best(self, global_payload, round_idx: int, dice: float):
        """Server-side AGGREGATE-best artifact: the global payload at the
        round where the weighted mean val dice peaked. Per-client states are
        NOT snapshotted here — each client saves its own best via
        :meth:`save_client_best` (reference semantics)."""
        self._save("best_global", {"payload": global_payload})
        with open(os.path.join(self.directory, "best_info.txt"), "w") as f:
            f.write(f"round={round_idx} dice={dice:.6f}\n")

    def save_client_best(self, cid: int, state, round_idx: int, dice: float):
        """Client-side own-best checkpoint: client ``cid``'s state at ITS OWN
        best ``val_mean_dice`` (the reference's BaseClient._validate saves
        client_{cid}_..._best_model.pth whenever its own metric improves,
        flower_common.py:106-114). ``state``: a ClientState namedtuple. The
        info file appends one line per improvement (the reference keeps
        timestamped .pth copies; a history line records the same facts)."""
        self._save(f"best_client_{cid}", {"state": state._asdict()})
        info = os.path.join(self.directory, f"best_client_{cid}_info.txt")
        with open(info, "a") as f:
            f.write(f"iter={round_idx} dice={dice:.6f}\n")

    def save_periodic(self, global_payload, client_states: Dict, round_idx: int):
        self._save(f"iter_{round_idx}_global", {"payload": global_payload})

    def save_resume(self, server_state: Dict):
        self._save("resume", server_state)

    def restore_resume(self, template: Dict) -> Optional[Dict]:
        try:
            return self._restore("resume", template)
        except FileNotFoundError:
            return None

    def restore_best_global(self, template) -> Any:
        return self._restore("best_global", {"payload": template})["payload"]

    def restore_best_client(self, cid: int, state_template: Dict) -> Any:
        """Client ``cid``'s own-best state (saved by :meth:`save_client_best`
        when that client's own val_mean_dice improved — the reference's
        client-side best checkpoint, flower_common.py:106-114, which test.py
        then loads as client_{N}_{model}_best_model.pth).
        ``state_template``: a ClientState._asdict()-shaped tree."""
        return self._restore(f"best_client_{cid}", {"state": state_template})[
            "state"
        ]
