"""Config plumbing: YAML -> nested dataclasses.

The reference drives training from per-model ``model.yml`` files parsed by
jsonargparse/LightningCLI (fit_latent.py:23-32); here configs are plain YAML
mapped onto the model/trainer dataclasses recursively by type hints.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, TypeVar, get_type_hints

import yaml

T = TypeVar("T")


def dataclass_from_dict(cls: type[T], data: dict[str, Any]) -> T:
    """recursively build a dataclass from a nested dict, using field type
    hints to descend into nested dataclasses; unknown keys raise"""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")

    hints = get_type_hints(cls)
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs: dict[str, Any] = {}

    for key, value in data.items():
        if key not in field_names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        hint = hints.get(key)
        if (
            isinstance(value, dict)
            and hint is not None
            and dataclasses.is_dataclass(hint)
        ):
            kwargs[key] = dataclass_from_dict(hint, value)
        else:
            kwargs[key] = value

    return cls(**kwargs)


def load_yaml_config(path: str | Path) -> dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}
