"""Checkpointing via Orbax (replaces HF Trainer save/resume +
stage3_gather_16bit_weights_on_model_save; SURVEY.md section 5)."""

from __future__ import annotations

import json
import os


def save_train_state(path: str, params, opt_state, metadata: dict):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(metadata, f)
    return path


def restore_train_state(path: str, params_like, opt_state_like):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"),
                               item=params_like)
    with ocp.PyTreeCheckpointer() as ckptr:
        opt_state = ckptr.restore(os.path.join(path, "opt_state"),
                                  item=opt_state_like)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta


def save_model_only(path: str, params):
    """--save_only_model equivalent (run_SpaceR_SG_RLVR.sh:38)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    return path


def load_model_only(path: str, params_like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, "params"), item=params_like)
