"""Environment-driven pipeline configuration.

Mirrors the reference's ``read_config``/``load_dotenv`` pair
(R/utils.R:87-105, inst/config.yml): a YAML file with per-environment
sections (default / production), selected by an env var, with
``!expr Sys.getenv(...)``-style secrets resolved from the process
environment.  Secrets use ``${VAR}`` or ``${VAR:-default}`` syntax.
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

_ENV_RE = re.compile(r"\$\{(?P<var>[A-Za-z_][A-Za-z0-9_]*)(?::-(?P<default>[^}]*))?\}")


def _resolve(value: Any) -> Any:
    if isinstance(value, str):
        def sub(m: re.Match) -> str:
            return os.environ.get(m.group("var"), m.group("default") or "")

        return _ENV_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _resolve(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve(v) for v in value]
    return value


def load_dotenv(path: str = ".env") -> None:
    """Populate os.environ from a dotenv file (existing vars win)."""
    if not os.path.exists(path):
        return
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        os.environ.setdefault(k.strip(), v.strip().strip('"').strip("'"))


def read_config(
    path: str,
    environment: str | None = None,
    env_var: str = "PIPELINE_ENV",
) -> dict:
    """Load the config section for the active environment, deep-merged
    over ``default``, with ``${VAR}`` placeholders resolved."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    env = environment or os.environ.get(env_var, "default")
    base = raw.get("default", {}) or {}
    overlay = raw.get(env, {}) if env != "default" else {}

    def merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for k, v in (b or {}).items():
            out[k] = merge(out[k], v) if isinstance(v, dict) and isinstance(out.get(k), dict) else v
        return out

    return _resolve(merge(base, overlay))
