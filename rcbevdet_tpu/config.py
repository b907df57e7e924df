"""Python-file config system with ``_base_`` inheritance.

Mirrors the public surface of mmcv's ``Config`` as the reference uses it
(SURVEY.md §5: configs are executable Python producing nested dicts,
``_base_`` multi-file inheritance with dict merging, CLI deep-override via
``--cfg-options key.sub=val``) — implemented as a ~100-line standalone
loader, no mmcv.
"""

from __future__ import annotations

import ast
import copy
import importlib.util
import os
from typing import Any, Dict, List


class ConfigDict(dict):
    """dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _to_configdict(obj):
    if isinstance(obj, dict):
        return ConfigDict({k: _to_configdict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_configdict(v) for v in obj)
    return obj


def _merge(base: Dict, new: Dict) -> Dict:
    """Recursive dict merge; ``_delete_=True`` in new replaces wholesale."""
    out = copy.deepcopy(base)
    for k, v in new.items():
        if (
            isinstance(v, dict)
            and k in out
            and isinstance(out[k], dict)
            and not v.get("_delete_", False)
        ):
            out[k] = _merge(out[k], v)
        else:
            v = copy.deepcopy(v)
            if isinstance(v, dict):
                v.pop("_delete_", None)
            out[k] = v
    return out


def _exec_config_file(path: str) -> Dict[str, Any]:
    spec = importlib.util.spec_from_file_location(
        "rcbevdet_cfg_" + os.path.basename(path).replace(".", "_"), path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {
        k: v
        for k, v in vars(mod).items()
        if not k.startswith("__") and not callable(v) and not isinstance(v, type(os))
    }


class Config:
    """Loaded configuration: attribute-accessible nested dicts."""

    def __init__(self, cfg_dict: Dict[str, Any], filename: str = ""):
        self._cfg = _to_configdict(cfg_dict)
        self.filename = filename

    def __getattr__(self, k):
        if k in ("_cfg", "filename"):
            raise AttributeError(k)
        try:
            return self._cfg[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __getitem__(self, k):
        return self._cfg[k]

    def __contains__(self, k):
        return k in self._cfg

    def get(self, k, default=None):
        return self._cfg.get(k, default)

    def keys(self):
        return self._cfg.keys()

    def to_dict(self):
        return copy.deepcopy(dict(self._cfg))

    @staticmethod
    def fromfile(path: str) -> "Config":
        path = os.path.abspath(path)
        cfg = _exec_config_file(path)
        bases = cfg.pop("_base_", [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            base_cfg = Config.fromfile(os.path.join(os.path.dirname(path), b))
            merged = _merge(merged, base_cfg.to_dict())
        merged = _merge(merged, cfg)
        return Config(merged, filename=path)

    def merge_from_options(self, options: Dict[str, str]):
        """Apply --cfg-options style overrides ('a.b.c=val', parsed via
        literal_eval with string fallback)."""
        for key, val in options.items():
            if isinstance(val, str):
                try:
                    val = ast.literal_eval(val)
                except (ValueError, SyntaxError):
                    pass
            node = self._cfg
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], dict):
                    node[p] = ConfigDict()
                node = node[p]
            node[parts[-1]] = _to_configdict(val)
        return self
