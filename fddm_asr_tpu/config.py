# -*- coding: utf-8 -*-
"""Unified YAML config system.

The reference has three inconsistent config consumers: train.py's frozen-key
dataclass with attribute access (train.py:164-173), inference.py's raw dict
pair (--main-config + --diffusion-config, inference.py:73-93), and eval code
calling `.get` on whatever it receives (evaluate.py:143 etc.) — which crashes
on the dataclass (SURVEY quirk #3).  Here ONE dict-like `Config` object with
both attribute and `.get`/`[]` access serves every entry point.

Also fixed here (quirk #1): special token ids are read from the tokenizer's
`vocab.json` sidecar when available instead of trusting the YAML's `pad_id`
(the shipped config says pad_id=0 but the trained tokenizer has <pad>=3).

`base_config:` inheritance (used by fddm_sweep.yaml) is resolved recursively
with deep-merging; sweep-space leaves ({distribution:..., values/min/max}) are
recognised by the sweep runner, not here.
"""
from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, Iterator, Mapping, Optional

import yaml

__all__ = ["Config", "load_config", "load_yaml", "deep_merge", "resolve_special_ids"]


class Config(Mapping):
    """Read-mostly nested mapping with attribute access and dict semantics.

    cfg.model.d_model == cfg["model"]["d_model"] == cfg.get("model").get("d_model")
    Nested dicts are wrapped lazily; `.to_dict()` returns plain data.
    """

    __slots__ = ("_data",)

    def __init__(self, data: Optional[Mapping[str, Any]] = None):
        object.__setattr__(self, "_data", dict(data or {}))

    # mapping protocol -------------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return _wrap(self._data[key])

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        return _wrap(self._data.get(key, default))

    # attribute access -------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return _wrap(self._data[key])
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = value

    # utils ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def updated(self, other: Mapping[str, Any]) -> "Config":
        return Config(deep_merge(self._data, dict(other)))

    def __repr__(self) -> str:
        return f"Config({self._data!r})"


def _wrap(v: Any) -> Any:
    return Config(v) if isinstance(v, dict) else v


def deep_merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = copy.deepcopy(dict(base))
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def load_config(
    path: str,
    overrides: Optional[Mapping[str, Any]] = None,
    resolve_base: bool = True,
) -> Config:
    """Load a YAML config, resolving `base_config:` inheritance chains."""
    raw = load_yaml(path)
    if resolve_base and "base_config" in raw:
        base_path = raw.pop("base_config")
        if not os.path.isabs(base_path):
            # base paths in shipped configs are repo-relative; also accept
            # child-dir-relative (full relative path first — basename-only
            # last, since it silently discards directory components and
            # could resolve to an unrelated same-named file)
            candidates = [
                base_path,
                os.path.join(os.path.dirname(path), base_path),
                os.path.join(os.path.dirname(path), os.path.basename(base_path)),
            ]
            for cand in candidates:
                if os.path.exists(cand):
                    base_path = cand
                    break
            else:
                raise FileNotFoundError(
                    f"base_config {base_path!r} (from {path}) not found; "
                    f"tried: {candidates}"
                )
        base = load_config(base_path, resolve_base=True).to_dict()
        raw = deep_merge(base, raw)
    if overrides:
        raw = deep_merge(raw, dict(overrides))
    return Config(raw)


def resolve_special_ids(cfg: Config, tokenizer_dir: Optional[str] = None) -> Dict[str, Optional[int]]:
    """Resolve pad/bos/eos/unk ids, preferring the tokenizer's vocab.json.

    The reference trusts cfg.data.pad_id (quirk #1: the YAML says 0 but the
    shipped tokenizer has <pad>=3/<unk>=0).  Search order:
      1. `vocab.json` next to data.tokenizer_path (or in tokenizer_dir);
      2. cfg.data.{pad,bos,eos,unk}_id;
      3. pad_id falls back to 0 (the reference YAML default).
    """
    data = cfg.get("data", Config())
    out = {
        "pad_id": data.get("pad_id"),
        "bos_id": data.get("bos_id"),
        "eos_id": data.get("eos_id"),
        "unk_id": data.get("unk_id"),
    }
    tok_path = tokenizer_dir or data.get("tokenizer_path") or data.get("tokenizer_model_path")
    if tok_path:
        d = tok_path if os.path.isdir(tok_path) else os.path.dirname(tok_path)
        sidecar = os.path.join(d, "vocab.json")
        if os.path.exists(sidecar):
            try:
                with open(sidecar, "r", encoding="utf-8") as f:
                    vj = json.load(f)
                special = vj.get("special_token_ids", {})
                for key in ("pad_id", "bos_id", "eos_id", "unk_id"):
                    # sidecar key style is "pad_id" (reference
                    # tokenizer_train.py:129-160); accept bare "pad" too
                    if key in special:
                        out[key] = int(special[key])
                    elif key[:-3] in special:
                        out[key] = int(special[key[:-3]])
            except (json.JSONDecodeError, OSError):
                pass
    if out["pad_id"] is None:
        out["pad_id"] = 0
    return out
