"""Config loading: TOML file + CLI-style overrides (SURVEY.md §6
"Config/flag system", component C1).

The reference reads a namelist-style key=value text file at startup;
here a TOML table maps 1:1 onto the frozen `Config` dataclass, with
`key=value` override strings on top (CLI `--set key=value`).  Values in
overrides are parsed as Python literals where possible so `nu2=300.0`,
`rho=(1026.0,1027.5)`, `wind=true` all work.
"""

from __future__ import annotations

import ast
import dataclasses
import tomllib
from typing import Iterable, Mapping, Optional

from beom_tpu.core.config import Config

_FIELDS = {f.name for f in dataclasses.fields(Config)}


def _coerce(key: str, value):
    if isinstance(value, str):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass  # keep raw string (e.g. scheme="fb")
    if isinstance(value, list):
        value = tuple(value)
    return value


def from_dict(d: Mapping, base: Optional[Config] = None) -> Config:
    unknown = set(d) - _FIELDS
    if unknown:
        raise KeyError(f"unknown Config keys: {sorted(unknown)}")
    kw = {k: _coerce(k, v) for k, v in d.items()}
    if base is None:
        return Config(**kw)
    return dataclasses.replace(base, **kw)


def load_toml(path, overrides: Iterable[str] = ()) -> Config:
    """Config from a TOML file; `overrides` are 'key=value' strings."""
    with open(path, "rb") as f:
        d = dict(tomllib.load(f))
    case = d.pop("case", None)   # optional: start from a canonical case cfg
    cfg = from_dict(d) if case is None else from_dict(
        d, base=_case_config(case))
    return apply_overrides(cfg, overrides)


def parse_overrides(overrides: Iterable[str]) -> dict:
    """'key=value' strings -> coerced kwargs dict (keys unrestricted:
    case factories take non-Config parameters like L, H0, tau0)."""
    kw = {}
    for item in overrides:
        key, sep, value = item.partition("=")
        if not sep:
            raise ValueError(f"override {item!r} is not key=value")
        kw[key.strip()] = _coerce(key, value.strip())
    return kw


def apply_overrides(cfg: Config, overrides: Iterable[str]) -> Config:
    kw = parse_overrides(overrides)
    unknown = set(kw) - _FIELDS
    if unknown:
        raise KeyError(f"unknown Config keys: {sorted(unknown)}")
    return dataclasses.replace(cfg, **kw) if kw else cfg


def _case_config(name: str) -> Config:
    from beom_tpu.cases import make_case
    cfg, _, _, _ = make_case(name)
    return cfg


def load_toml_case(path, overrides: Iterable[str] = ()):
    """Build a full runnable experiment from a TOML file.

    The file must name a canonical geometry with `case = "<name>"`;
    every other top-level key is passed to the case factory — Config
    fields (nx, scheme, ...) and factory-specific parameters (L, H0,
    tau0, ...) alike, since the factories accept both.  `overrides`
    ('key=value' strings, CLI --set) are folded into the same kwargs
    *before* the geometry is built, so grid-shaping keys like nx stay
    consistent with the arrays.

    Returns (cfg, grid, forcing, state) — the make_case contract.
    """
    from beom_tpu.cases import make_case

    with open(path, "rb") as f:
        d = dict(tomllib.load(f))
    name = d.pop("case", None)
    if name is None:
        raise ValueError(
            f"{path}: a runnable TOML must set case = '<canonical case>' "
            "(the geometry factory; see beom_tpu.cases)")
    kw = {k: _coerce(k, v) for k, v in d.items()}
    kw.update(parse_overrides(overrides))
    return make_case(name, **kw)
