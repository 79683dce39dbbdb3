"""Training checkpoint/resume via orbax — TPU equivalent of the reference's
best_checkpoint.pth / latest_checkpoint.pth scheme (train.py:490-503,
test_train.py:402-420,662-670: model+optimizer+scheduler+epoch/best/trial)."""
from __future__ import annotations

import os
from typing import Any, Optional

def _ckptr():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(directory: str, name: str, state, extra: dict) -> str:
    """Save TrainState + counters (epoch/best_val_loss/trial)."""
    ocp = _ckptr()
    path = os.path.join(os.path.abspath(directory), name)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"step": state.step, "params": state.params,
                          "opt_state": state.opt_state, "extra": extra},
                   force=True)
    return path


def load_checkpoint(directory: str, name: str, template: Optional[Any] = None):
    """-> {"step", "params", "opt_state", "extra"} or None if absent.

    `template`: a TrainState with matching structure — required to restore
    optax NamedTuple states (orbax round-trips them as plain dicts otherwise).
    """
    ocp = _ckptr()
    path = os.path.join(os.path.abspath(directory), name)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            item = {"step": template.step, "params": template.params,
                    "opt_state": template.opt_state,
                    "extra": {"epoch": 0, "best_val_loss": 0.0, "trial": 0}}
            restored = ckptr.restore(path, item=item)
        else:
            restored = ckptr.restore(path)
    return restored


def latest_exists(directory: str) -> bool:
    return os.path.exists(os.path.join(os.path.abspath(directory),
                                       "latest_checkpoint"))
