"""Layered YAML configuration.

Same two-layer overlay semantics as the reference (`utils/__init__.py:9-40`):
a base config (`configs/basic.yaml`) updated by an experiment config, exposed
as an attribute-style object. Keys are intentionally compatible with the
reference's config names so experiment YAMLs carry over unchanged.
"""
from __future__ import annotations

import pathlib
from typing import Any, Mapping

import yaml

try:  # prefer the C loader when present
    from yaml import CSafeLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _Loader

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
DEFAULT_BASIC_CONFIG = _REPO_ROOT / "configs" / "basic.yaml"


class DictConfig(dict):
    """dict with attribute access (`cfg.key` == `cfg['key']`)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __repr__(self) -> str:
        return "\n".join(f"{k}: {v}" for k, v in self.items())

    def get_path(self, name: str) -> pathlib.Path:
        """Resolve a path-valued key relative to the repo root."""
        p = pathlib.Path(self[name])
        return p if p.is_absolute() else _REPO_ROOT / p


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return DictConfig({k: _wrap(v) for k, v in obj.items()})
    return obj


def load_yaml(path) -> DictConfig:
    with open(path) as f:
        return _wrap(yaml.load(f, _Loader) or {})


def get_basic_config(basic_path=None) -> DictConfig:
    return load_yaml(basic_path or DEFAULT_BASIC_CONFIG)


def get_config(experiment_path, basic_path=None) -> DictConfig:
    """basic.yaml overlaid with an experiment YAML (flat update, matching
    reference `utils/__init__.py:35-40`)."""
    cfg = get_basic_config(basic_path)
    cfg.update(load_yaml(experiment_path))
    return cfg
