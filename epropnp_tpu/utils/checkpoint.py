"""Checkpoint save/restore for functional train states.

Serializes any pytree (params, batch stats, optimizer state, EMA loss
buffers — the latter being registered buffers in the reference, which must
checkpoint with the model: SURVEY.md §5 checkpoint/resume) with flax's
msgpack serialization. Partial/filtered restore mirrors the reference's
key-filtered ``load_model`` (EPro-PnP-6DoF/lib/model.py:79-113).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import flax.serialization


def save_checkpoint(path: str, state: Any) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.to_bytes(state)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption
    return path


def load_checkpoint(path: str, target: Any,
                    filter_fn: Optional[Callable[[str], bool]] = None) -> Any:
    """Restore ``target``-shaped state from ``path``.

    ``filter_fn(top_level_key)`` selects which top-level entries to restore
    (e.g. backbone-only init); unfiltered entries keep ``target``'s values.
    """
    with open(path, 'rb') as f:
        data = f.read()
    restored = flax.serialization.from_bytes(target, data)
    if filter_fn is None:
        return restored
    state_dict = flax.serialization.to_state_dict(target)
    new_dict = flax.serialization.to_state_dict(restored)
    merged = {k: (new_dict[k] if filter_fn(k) else v)
              for k, v in state_dict.items()}
    return flax.serialization.from_state_dict(target, merged)
