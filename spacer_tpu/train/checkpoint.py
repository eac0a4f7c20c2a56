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


def _restore_tree(ckptr, path, like):
    """Restore with the TARGET topology's shardings taken from `like`.

    Passing explicit restore args makes cross-topology resume safe (save on
    fsdp-8, restore on 2x2x2 or a single chip): Orbax reshards to the
    target placement instead of trusting the checkpoint's recorded
    topology.
    """
    import orbax.checkpoint as ocp

    restore_args = ocp.checkpoint_utils.construct_restore_args(like)
    return ckptr.restore(path, item=like, restore_args=restore_args)


def restore_train_state(path: str, params_like, opt_state_like):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        params = _restore_tree(ckptr, os.path.join(path, "params"),
                               params_like)
    with ocp.PyTreeCheckpointer() as ckptr:
        opt_state = _restore_tree(ckptr, os.path.join(path, "opt_state"),
                                  opt_state_like)
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
        if params_like is None:
            return ckptr.restore(os.path.join(path, "params"))
        return _restore_tree(ckptr, os.path.join(path, "params"),
                             params_like)
