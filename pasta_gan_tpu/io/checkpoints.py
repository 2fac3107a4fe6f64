"""Orbax checkpointing (SURVEY.md section 5.4 rebuild plan).

Two artifact kinds, mirroring the reference's split:
* full train state ({params, ema, opt moments, step, controllers}) for
  resume — unlike the reference, optimizer state and step ARE checkpointed
  (`training_loop_wo_flow_fullbody.py:280-285` restarts the schedule; noted
  there as a gap),
* network snapshots (`network-snapshot-NNNNNN` == G_ema params + config dict)
  for inference/eval, replacing the source-embedding pickle with plain
  arrays + json config (loadable forever without executing stored code).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train.state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_train_state(path: str, state: TrainState) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(path), template)


def save_snapshot(path: str, g_ema_params: Any, w_avg, config_json: str) -> None:
    """network-snapshot equivalent: EMA generator params + resolved config."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"g_ema_params": jax.device_get(g_ema_params), "w_avg": np.asarray(w_avg)}
    ckptr.save(_abs(path), payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(_abs(path), "config.json"), "w") as f:
        f.write(config_json)


def load_snapshot(path: str, template: Optional[Any] = None):
    """Returns (g_ema_params, w_avg, config_dict)."""
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        payload = ckptr.restore(_abs(path), template)
    else:
        payload = ckptr.restore(_abs(path))
    cfg_path = os.path.join(_abs(path), "config.json")
    config = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    return payload["g_ema_params"], payload["w_avg"], config
