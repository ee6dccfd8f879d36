"""Native checkpoint save/load with embedded config + auto-resume.

Mirrors the reference's two resilience mechanisms (SURVEY.md §5):
  * GLIGEN-style dict ckpt with the config embedded as source of truth
    (trainer_combined_layout.py:523-535) — here a directory containing
    ``state.msgpack``-style pickled numpy pytrees plus ``config.json``;
  * auto-resume by scanning for the newest ``checkpoint_*`` in the run dir
    (create_expt_folder_with_auto_resuming, trainer_combined_layout.py:147).
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
import re
from typing import Any, Optional, Tuple

import numpy as np
import jax


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, config: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, os.path.join(path, "state.pkl"))
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(_jsonable(config), f, indent=2)


def load_checkpoint(path: str) -> Tuple[Any, Optional[dict]]:
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        state = pickle.load(f)
    config = None
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, config


def _jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


_CKPT_RE = re.compile(r"^checkpoint_(\d+)$")


def find_latest_checkpoint(run_dir: str) -> Optional[str]:
    """Newest checkpoint_NNNNNNNN subdirectory, or checkpoint_latest."""
    if not os.path.isdir(run_dir):
        return None
    latest = os.path.join(run_dir, "checkpoint_latest")
    if os.path.exists(os.path.join(latest, "state.pkl")):
        return latest
    best, best_iter = None, -1
    for name in os.listdir(run_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_iter:
            cand = os.path.join(run_dir, name)
            if os.path.exists(os.path.join(cand, "state.pkl")):
                best, best_iter = cand, int(m.group(1))
    return best


def create_run_dir_with_auto_resume(output_root: str, name: str) -> Tuple[str, Optional[str]]:
    """(run_dir, resume_ckpt_or_None); appends tagNN subdirs like the
    reference so distinct launches never clobber each other."""
    base = os.path.join(output_root, name)
    os.makedirs(base, exist_ok=True)
    tags = sorted(d for d in os.listdir(base) if re.match(r"^tag\d+$", d))
    if tags:
        newest = os.path.join(base, tags[-1])
        ckpt = find_latest_checkpoint(newest)
        if ckpt is not None:
            return newest, ckpt
        run_dir = os.path.join(base, f"tag{int(tags[-1][3:]) + 1:02d}")
    else:
        run_dir = os.path.join(base, "tag00")
    os.makedirs(run_dir, exist_ok=True)
    return run_dir, None
