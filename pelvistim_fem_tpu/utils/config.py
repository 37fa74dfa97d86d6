"""Parameter/config system — YAML with legacy-key fallbacks.

Mirrors the reference's load_params/_pl/_stim (step03
run_layered_sweep.py:52-64) including the backward-compat aliases
'placement'|'electrodes' and 'stim'|'control', and its params.yaml schema
(geometry / layers / conductivities / contact / placement / mesh / roi /
stim / solver / plotting — step03 params.yaml:17-99,
step04 params.yaml:23-93).
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml


def load_params(path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def get_placement(p: dict) -> dict:
    """Placement sub-dict (supports the old 'electrodes' key)."""
    return p.get("placement", p.get("electrodes", {}))


def get_stim(p: dict) -> dict:
    """Stim sub-dict (supports the old 'control' key)."""
    return p.get("stim", p.get("control", {}))


def merge_params(base: dict, override: dict) -> dict:
    """Deep-merge override into a copy of base (for sweep-point overrides)."""
    out = copy.deepcopy(base)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                rec(dst[k], v)
            else:
                dst[k] = copy.deepcopy(v)

    rec(out, override)
    return out


_DEFAULTS_DIR = Path(__file__).resolve().parent.parent / "data"


def default_params(step: str) -> dict:
    """Bundled default parameter sets for the four reference workloads."""
    return load_params(_DEFAULTS_DIR / f"{step}.yaml")
