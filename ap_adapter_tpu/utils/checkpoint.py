"""Checkpoint IO: orbax for training state, msgpack for model params, and the
reference-compatible flat adapter dict (adapter/params.py).

Two mechanisms mirror the reference (SURVEY §5 checkpoint/resume):
  1. full training state (params + optimizer) with rotation — orbax
     (vs accelerate.save_state, train_apadapter_v2.py:987-1011);
  2. the flat adapter-only dict consumed by inference and finetune-resume
     (.npz here; torch .bin import supported in pipeline/tasks.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from flax import serialization


def save_params(directory: str, params: Dict[str, Any]) -> None:
    """Serialize a {model_name: param_tree} dict to <dir>/<name>.msgpack."""

    os.makedirs(directory, exist_ok=True)
    for name, tree in params.items():
        with open(os.path.join(directory, f"{name}.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(tree))


def load_params(directory: str, names=None) -> Dict[str, Any]:
    out = {}
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith(".msgpack"):
            continue
        name = fn[: -len(".msgpack")]
        if names and name not in names:
            continue
        with open(os.path.join(directory, fn), "rb") as f:
            out[name] = serialization.msgpack_restore(f.read())
    if not out:
        raise FileNotFoundError(f"no .msgpack params found in {directory}")
    return out


def save_flat_adapter(path: str, flat: Dict[str, np.ndarray]) -> None:
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


# ---------------------------------------------------------------------------
# orbax training-state checkpoints with rotation
# ---------------------------------------------------------------------------


class TrainCheckpointer:
    """Rotating step checkpoints (vs reference checkpoints_total_limit logic,
    train_apadapter_v2.py:987-1011)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step, args=self._ocp.args.StandardRestore(state_like))
