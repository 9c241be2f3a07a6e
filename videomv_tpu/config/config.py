"""Config system: recursive YAML merge with attr-style access.

Reproduces the reference merge semantics (utils/config.py:10-225 +
utils/assign_cfg.py:64-77 + the per-engine defaults merge,
train_t2v_enterance.py:38-42) in one clean layer:

  load order:  package defaults  →  configs/base.yaml (if present)
            →  task YAML (with _BASE/_BASE_RUN/_BASE_MODEL recursion)
            →  linked YAML via key (e.g. inference's ``vldm_cfg``)
            →  CLI ``k v`` override pairs (dotted keys, depth ≤ 4)

Dict values are *updated* key-by-key, never replaced — so a task YAML that
sets only ``UNet.use_lgm_refine`` keeps every other UNet default.  String
scientific notation like ``3e-5`` coerces to float (reference
utils/config.py:209-210 quirk, preserved intentionally).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

from .defaults import default_cfg

__all__ = ["AttrDict", "Config", "load_config", "merge_linked_config"]


class AttrDict(dict):
    """dict with attribute access (recursive). Replacement for EasyDict."""

    def __init__(self, d: Optional[dict] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, key, value):
        value = _wrap(value)
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, AttrDict):
                return {k: unwrap(u) for k, u in v.items()}
            if isinstance(v, list):
                return [unwrap(u) for u in v]
            return v

        return unwrap(self)

    def dump(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)


def _wrap(value):
    if isinstance(value, dict) and not isinstance(value, AttrDict):
        return AttrDict(value)
    if isinstance(value, str) and len(value) > 2 and value[1:3] == "e-":
        # reference coerces strings like '3e-5' (utils/config.py:209-210)
        try:
            return float(value)
        except ValueError:
            return value
    return value


Config = AttrDict  # public alias


def deep_update(base: dict, new: dict) -> dict:
    """Merge ``new`` into ``base``: nested dicts update recursively, scalars
    and lists replace (reference _merge_cfg_from_base, utils/config.py:130-140)."""
    for k, v in new.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def _read_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.load(f.read(), Loader=yaml.SafeLoader) or {}


def _load_yaml_with_bases(path: str) -> dict:
    """Load a YAML file honoring _BASE / _BASE_RUN / _BASE_MODEL references
    (paths relative to the referencing file)."""
    cfg = _read_yaml(path)
    base_keys = [k for k in ("_BASE", "_BASE_RUN", "_BASE_MODEL") if k in cfg]
    if not base_keys:
        return cfg
    merged: Dict[str, Any] = {}
    for key in base_keys:
        ref = cfg.pop(key)
        ref_path = os.path.normpath(os.path.join(os.path.dirname(path), ref.lstrip("./")))
        if not os.path.exists(ref_path):
            ref_path = ref  # absolute / cwd-relative
        deep_update(merged, _load_yaml_with_bases(ref_path))
    deep_update(merged, cfg)
    return merged


def apply_cli_opts(cfg: dict, opts: Sequence[str]) -> dict:
    """Apply ``k v`` override pairs with dotted keys of depth ≤ 4
    (reference _merge_cfg_from_command, utils/config.py:157-202)."""
    assert len(opts) % 2 == 0, f"Override list {opts} has odd length"
    for key, val in zip(opts[0::2], opts[1::2]):
        parts = key.split(".")
        assert len(parts) <= 4, f"Key depth error (max 4): {key}"
        node = cfg
        for p in parts[:-1]:
            assert p in node, f"Non-existent key: {key}"
            node = node[p]
        try:
            val = yaml.load(val, Loader=yaml.SafeLoader)
        except yaml.YAMLError:
            pass
        node[parts[-1]] = val
    return cfg


def load_config(
    cfg_file: str,
    opts: Sequence[str] = (),
    base_yaml: Optional[str] = None,
    include_defaults: bool = True,
) -> AttrDict:
    """Build the full merged config for a task YAML."""
    cfg: Dict[str, Any] = default_cfg() if include_defaults else {}
    if base_yaml is None:
        candidate = os.path.join(os.path.dirname(cfg_file) or ".", "base.yaml")
        base_yaml = candidate if os.path.exists(candidate) else None
    if base_yaml:
        deep_update(cfg, _read_yaml(base_yaml))
    deep_update(cfg, _load_yaml_with_bases(cfg_file))
    apply_cli_opts(cfg, list(opts))
    return AttrDict(cfg)


def merge_linked_config(cfg: AttrDict, link_key: str) -> AttrDict:
    """Merge the YAML whose path is stored at ``cfg[link_key]`` *underneath*
    the current config (reference assign_signle_cfg, utils/assign_cfg.py:64-77:
    linked values fill in, existing dicts update, then the task's own keys win).
    """
    out = copy.deepcopy(cfg)
    path = cfg.get(link_key)
    if not path or not os.path.exists(path):
        return out
    linked = _load_yaml_with_bases(path)
    for k, v in linked.items():
        if isinstance(v, dict) and k in out and isinstance(out[k], dict):
            # reference semantics: vldm_cfg[k].update(v) — linked wins on
            # nested keys (assign_cfg.py:72-74); the engine then re-applies
            # its own task YAML on top, which load_inference_config does.
            out[k] = AttrDict({**dict(out[k]), **v})
        else:
            out[k] = v
    return out


def load_inference_config(
    cfg_file: str, opts: Sequence[str] = (), link_key: str = "vldm_cfg"
) -> AttrDict:
    """Full inference config: defaults → task YAML → linked train YAML →
    task YAML re-applied → CLI opts (mirrors the engine's merge order,
    inference_text2video_entrance.py:69 + :70-76)."""
    cfg = load_config(cfg_file, opts=())
    cfg = merge_linked_config(cfg, link_key)
    task = _load_yaml_with_bases(cfg_file)
    deep_update(cfg, task)
    apply_cli_opts(cfg, list(opts))
    return AttrDict(cfg)
