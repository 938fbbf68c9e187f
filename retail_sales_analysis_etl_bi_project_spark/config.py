"""Layered settings loader — engine twin of the reference's hybrid
config (etl/hybrid_settings.py:18-91: .env via dotenv + config.ini via
configparser + pydantic validation, merged with env-var precedence).

Stdlib-only reimplementation with the same layering semantics:

    defaults  <  config.ini  <  .env file  <  process environment

The reference's DB section (Oracle host/port/service/password) maps to
the engine's Spark-facing knobs: there is no external database — the
"connection" is a SparkSession (session.py) — so the secret-bearing DB
settings become master/shuffle/memory settings, and the path + ETL
options carry over directly (data_path, staging_path, log_level,
batch_size).

Like the reference, inline ``;`` comments in ini values are stripped
(hybrid_settings._clean), and an invalid LOG_LEVEL raises at load time
(hybrid_settings validator)."""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, fields
from pathlib import Path

_ALLOWED_LOG_LEVELS = {"DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"}

# (field, ini section, ini key, type) — the ini surface mirrors the
# reference's config.ini sections [DEFAULT]/[etl] plus a [spark]
# section replacing [db].
_INI_MAP = [
    ("data_path", "DEFAULT", "data_path", str),
    ("staging_path", "DEFAULT", "staging_path", str),
    ("warehouse_path", "DEFAULT", "warehouse_path", str),
    ("log_level", "DEFAULT", "log_level", str),
    ("batch_size", "etl", "batch_size", int),
    ("generator_rows", "etl", "generator_rows", int),
    ("master", "spark", "master", str),
    ("shuffle_partitions", "spark", "shuffle_partitions", int),
    ("driver_memory", "spark", "driver_memory", str),
]


@dataclass
class Settings:
    """Validated settings object (reference: pydantic Settings)."""

    data_path: str = ""  # empty -> run the synthetic generator
    staging_path: str = "warehouse/staging"
    warehouse_path: str = "warehouse/gold"
    log_level: str = "INFO"
    batch_size: int = 5000  # reference: rows per INSERT chunk; here: writer partitioning hint
    generator_rows: int = 50_000
    master: str = ""  # empty -> session.py default (local[$SPARK_GRAFT_CPUS])
    shuffle_partitions: int = 0  # 0 -> session.py default
    driver_memory: str = ""

    def validate(self) -> "Settings":
        lvl = self.log_level.upper()
        if lvl not in _ALLOWED_LOG_LEVELS:
            raise ValueError(
                f"LOG_LEVEL must be one of {sorted(_ALLOWED_LOG_LEVELS)}, got {self.log_level!r}"
            )
        self.log_level = lvl
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        return self


def _clean(value: str) -> str:
    """Strip inline ``;`` comments, like hybrid_settings._clean."""
    return value.split(";")[0].strip() if value else value


def _parse_env_file(path: Path) -> dict[str, str]:
    """Minimal .env parser (KEY=VALUE lines, # comments) — the dotenv
    subset the reference's etl/.env actually uses."""
    out: dict[str, str] = {}
    if not path.is_file():
        return out
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        out[key.strip()] = val.strip().strip("'\"")
    return out


def load_settings(
    root: str | Path | None = None,
    ini_name: str = "config.ini",
    env_name: str = ".env",
    environ: dict[str, str] | None = None,
) -> Settings:
    """Build Settings with the reference's precedence: ini defaults are
    overridden by .env-file values, which are overridden by real
    environment variables (env key = upper-cased field name, e.g.
    ``STAGING_PATH``, matching hybrid_settings' case-insensitive env
    lookup)."""
    root = Path(root) if root is not None else Path.cwd()
    environ = dict(os.environ if environ is None else environ)

    values: dict[str, object] = {}

    ini = configparser.ConfigParser()
    ini.read(root / ini_name)
    for field, section, key, typ in _INI_MAP:
        if ini.has_option(section, key):
            values[field] = typ(_clean(ini.get(section, key)))

    env_file = _parse_env_file(root / env_name)
    merged_env = {**env_file, **environ}  # real env wins over .env
    for f in fields(Settings):
        env_key = f.name.upper()
        if env_key in merged_env:
            typ = int if f.type == "int" else str
            values[f.name] = typ(merged_env[env_key])

    return Settings(**values).validate()
