"""YAML experiment configs over the frozen dataclass tree.

Capability target: the reference's yacs config stack
(vlnce_baselines/config/default.py:190-230 + run_r2r/iter_train.yaml) —
keeps the familiar section names (MODEL, IL, PRETRAIN, MESH, EVAL...) but
resolves once into the immutable ExperimentConfig; no defrost()/freeze()
mutation scattered through trainers.

YAML layout:
    BASE: r2r              # or rxr / tiny preset
    IL: {lr: 1.0e-5, iters: 15000, expert_policy: spl}
    PLANNER: {max_txt_len: 80}
    MESH: {dp: -1, mp: 1}
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import yaml

from etpnav_tpu import config as C

_SECTION_FIELDS = {
    "PLANNER": "planner",
    "WAYPOINT": "waypoint",
    "CLIP": "clip",
    "DEPTH": "depth",
    "GRAPH": "graph",
    "IL": "il",
    "PRETRAIN": "pretrain",
    "DAGGER": "dagger",
    "MESH": "mesh",
    "EVAL": "eval",
    "INFERENCE": "inference",
    "PATHS": "paths",
}

_PRESETS = {
    "r2r": C.r2r_config,
    "rxr": C.rxr_config,
    "tiny": C.tiny_config,
}


def _replace_section(section_obj, overrides: Dict[str, Any]):
    fields = {f.name for f in dataclasses.fields(section_obj)}
    unknown = set(overrides) - fields
    if unknown:
        raise KeyError(f"unknown config keys {sorted(unknown)} for "
                       f"{type(section_obj).__name__}")
    coerced = {}
    for k, v in overrides.items():
        cur = getattr(section_obj, k)
        if isinstance(cur, tuple) and isinstance(v, list):
            v = tuple(v)
        coerced[k] = v
    return dataclasses.replace(section_obj, **coerced)


def config_from_dict(d: Dict[str, Any]) -> C.ExperimentConfig:
    base = d.get("BASE", "r2r")
    if base not in _PRESETS:
        raise KeyError(f"unknown BASE preset {base!r}; "
                       f"options: {sorted(_PRESETS)}")
    cfg = _PRESETS[base]()
    top_overrides = {}
    for key, value in d.items():
        if key == "BASE":
            continue
        if key in _SECTION_FIELDS:
            field = _SECTION_FIELDS[key]
            cfg = dataclasses.replace(cfg, **{
                field: _replace_section(getattr(cfg, field), value)})
        elif key.lower() in {f.name for f in dataclasses.fields(cfg)}:
            top_overrides[key.lower()] = value
        else:
            raise KeyError(f"unknown config section {key!r}")
    if top_overrides:
        cfg = dataclasses.replace(cfg, **top_overrides)
    return cfg


def load_config(path: str, opts: Dict[str, Any] = None
                ) -> C.ExperimentConfig:
    """YAML file + CLI 'SECTION.key=value' overrides -> ExperimentConfig."""
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    for dotted, value in (opts or {}).items():
        section, _, key = dotted.partition(".")
        d.setdefault(section, {})
        if isinstance(d[section], dict):
            d[section][key] = value
        else:
            d[section] = value
    return config_from_dict(d)


def parse_cli_opts(pairs) -> Dict[str, Any]:
    """['IL.lr=1e-5', 'MESH.mp=2'] -> {'IL.lr': 1e-5, ...} with YAML-typed
    values (run.py `opts` equivalent)."""
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = yaml.safe_load(v)
    return out
