"""Checkpoint / resume on orbax.

A strict superset of the reference's ``torch.save(state_dict)`` flow
(reference scripts/train.py:172-184 saves weights only, every epoch +
every ``save_iter``): here the full (params, batch_stats, opt_state, step)
train state is saved, enabling exact auto-resume; evaluation loads with
missing-key tolerance like the reference's ``strict=False``
(scripts/eval.py:42).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_path: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(checkpoint_path)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(int(step),
                                 args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, variables: Any) -> None:
    """One-shot save of model variables (for eval-only checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))


def merge_pretrained_backbone(variables, path: str):
    """Warm-start the backbone subtree from a converted zoo checkpoint
    (tools/convert_torchvision.py or tools/convert_dla.py output).

    The analogue of the reference's pretrained-weights load
    (scripts/train.py:90-93 + resnet.py:14-20 model-zoo URLs): locate the
    backbone subtree (the dict containing 'conv1') anywhere in the model's
    params/batch_stats and overwrite matching leaves.
    """
    from flax import serialization

    with open(path, 'rb') as f:
        pretrained = serialization.msgpack_restore(f.read())

    def find_backbone(tree, trail=()):
        if isinstance(tree, dict):
            # ResNet subtree root holds 'conv1'; DLA subtree root holds
            # 'base_layer' (tools/convert_dla.py layout)
            if 'conv1' in tree or 'base_layer' in tree:
                return trail
            for k, v in tree.items():
                hit = find_backbone(v, trail + (k,))
                if hit is not None:
                    return hit
        return None

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in variables.items()}

    def deep_merge(dst, src, where):
        node = dst
        for k in where[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        target = dict(node[where[-1]]) if where else dst

        def merge(d, s):
            for k, v in s.items():
                if isinstance(v, dict) and isinstance(d.get(k), dict):
                    d[k] = dict(d[k])
                    merge(d[k], v)
                elif k in d:
                    assert d[k].shape == v.shape, (k, d[k].shape, v.shape)
                    d[k] = v
        merge(target, src)
        if where:
            node[where[-1]] = target
        return dst

    # locate the backbone via the params tree; batch_stats shares the same
    # module hierarchy (it has no 'conv1' leaf of its own)
    where = find_backbone(out.get('params', {}))
    if where is None:
        raise ValueError('no backbone subtree (conv1) found in params')
    for collection in ('params', 'batch_stats'):
        if collection not in pretrained or collection not in out:
            continue
        out[collection] = deep_merge(dict(out[collection]),
                                     pretrained[collection], where)
    return out
