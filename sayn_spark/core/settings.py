"""Project + settings config models (ref: core/project.py:15-93,
core/settings.py:235-340).

project.yaml  — shared, committed: parameters, presets, autogroups,
                required credentials, default_db.
settings.yaml — per-developer: profiles with credential refs, parameter
                overrides, stringify rules, from_prod globs.
SAYN_* env vars override settings (ref grammar core/settings.py:14-26):
  SAYN_PROFILE, SAYN_PARAMETER_<name>=yaml-value,
  SAYN_STRINGIFY_<key>=value, SAYN_FROM_PROD=csv.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import yaml
from pydantic import BaseModel, Field


class Project(BaseModel):
    """project.yaml (ref: core/project.py:15-70)."""

    default_db: str = "spark"
    required_credentials: list[str] = Field(default_factory=lambda: ["spark"])
    parameters: dict[str, Any] = Field(default_factory=dict)
    presets: dict[str, dict] = Field(default_factory=dict)
    autogroups: dict[str, dict] = Field(default_factory=dict)


class Profile(BaseModel):
    """One settings profile (ref: core/settings.py:129-180)."""

    credentials: dict[str, str] = Field(default_factory=dict)  # db name -> credential name
    parameters: dict[str, Any] = Field(default_factory=dict)
    stringify: dict[str, Optional[str]] = Field(default_factory=dict)
    from_prod: list[str] = Field(default_factory=list)


class Credential(BaseModel):
    """Named connection config.  type: spark (the session itself) or a
    Spark reader source (parquet/csv/json/jdbc dir) for copy tasks."""

    type: str = "spark"
    options: dict[str, Any] = Field(default_factory=dict)


class Settings(BaseModel):
    """settings.yaml (ref: core/settings.py:183-233)."""

    default_profile: Optional[str] = None
    profiles: dict[str, Profile] = Field(default_factory=dict)
    credentials: dict[str, Credential] = Field(default_factory=dict)

    def profile(self, name: Optional[str] = None) -> Profile:
        name = name or os.environ.get("SAYN_PROFILE") or self.default_profile
        if name is None:
            return next(iter(self.profiles.values())) if self.profiles else Profile()
        if name not in self.profiles:
            raise ValueError(f"unknown profile {name!r}")
        return self.profiles[name]

    def prod_profile(self) -> Profile:
        """The profile that defines PROD naming: the default profile,
        NEVER the SAYN_PROFILE selection.  profile(None) honours the
        env var — right for picking the ACTIVE profile, wrong for the
        prod stringify rules: under SAYN_PROFILE=dev it would make
        "prod" mean the dev profile, so from_prod/--upstream-prod
        reads silently resolve to dev names (second-pass review
        r12)."""
        if self.default_profile is not None:
            if self.default_profile not in self.profiles:
                raise ValueError(f"unknown profile {self.default_profile!r}")
            return self.profiles[self.default_profile]
        return next(iter(self.profiles.values())) if self.profiles else Profile()


def _yaml_or_str(v: str) -> Any:
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def apply_env_overrides(profile: Profile) -> Profile:
    """SAYN_* env overrides (ref: core/settings.py:14-26, 235-283)."""
    out = profile.model_copy(deep=True)
    for key, val in os.environ.items():
        if key.startswith("SAYN_PARAMETER_"):
            out.parameters[key[len("SAYN_PARAMETER_") :].lower()] = _yaml_or_str(val)
        elif key.startswith("SAYN_STRINGIFY_"):
            out.stringify[key[len("SAYN_STRINGIFY_") :].lower()] = val
        elif key == "SAYN_FROM_PROD":
            out.from_prod = [s.strip() for s in val.split(",") if s.strip()]
    return out


def _load_yaml_mapping(path: Path) -> dict:
    """Parse one config file to a mapping with config-grade errors
    (hazard review r14): a stray tab used to surface as a raw
    yaml.ScannerError traceback, and a top-level list as an
    AttributeError — both now ValueError (which the CLI renders as a
    clean message) naming the file."""
    try:
        data = yaml.safe_load(path.read_text())
    except yaml.YAMLError as e:
        raise ValueError(f"{path}: invalid YAML — {e}") from e
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ValueError(
            f"{path}: top level must be a mapping, got {type(data).__name__}"
        )
    return data


def load_project(project_dir: str | Path) -> Project:
    path = Path(project_dir) / "project.yaml"
    data = _load_yaml_mapping(path) if path.exists() else {}
    return Project(**data)


def load_settings(project_dir: str | Path) -> Settings:
    path = Path(project_dir) / "settings.yaml"
    data = _load_yaml_mapping(path) if path.exists() else {}
    return Settings(**data)


def load_task_groups(project_dir: str | Path) -> dict[str, dict[str, dict]]:
    """tasks/*.yaml -> {group: {task_name: config}}
    (ref: core/project.py:73-93)."""
    out: dict[str, dict[str, dict]] = {}
    tasks_dir = Path(project_dir) / "tasks"
    if not tasks_dir.is_dir():
        return out
    for f in sorted(tasks_dir.glob("*.yaml")):
        data = _load_yaml_mapping(f)
        tasks = data.get("tasks", {}) or {}
        if not isinstance(tasks, dict):
            raise ValueError(
                f"{f}: 'tasks' must be a mapping of task name to config, "
                f"got {type(tasks).__name__}"
            )
        out[f.stem] = tasks
    return out
