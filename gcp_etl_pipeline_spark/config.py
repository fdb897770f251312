"""Environment configuration + secret resolution (SURVEY §2.11 R5).

Reference: ``env_configs`` maps env name → project/region/secret names
(`commons/utilities.py:89-106` over `configs/db_configs.py`), buckets get
a ``dd_``/``dp_`` env prefix (`commons/utilities.py:72,172-182`), and
credentials come from GCP Secret Manager (`commons/utilities.py:109-137`).

Engine form: one frozen ``EnvConfig`` per profile; secrets resolve
through a pluggable provider chain (default: process environment) so
production can install a real secret-manager client without touching
call sites, and tests inject dicts. No cloud SDK is imported here.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

_ENV_PREFIX = {"dev": "dd", "prod": "dp"}  # reference {env}->dd|dp mapping

SecretProvider = Callable[[str], str | None]


def env_secret_provider(name: str) -> str | None:
    """Default provider: process environment."""
    return os.environ.get(name)


@dataclass(frozen=True)
class EnvConfig:
    """One deployment profile (reference env_configs row)."""

    env: str = "dev"
    project: str = "local"
    region: str = "local"
    warehouse_root: str = "/tmp/graft_warehouse"
    secret_providers: tuple[SecretProvider, ...] = (env_secret_provider,)
    extras: Mapping[str, str] = field(default_factory=dict)

    @property
    def prefix(self) -> str:
        """The reference's dd_/dp_ env prefix for bucket/dataset names."""
        try:
            return _ENV_PREFIX[self.env]
        except KeyError:
            raise ValueError(
                f"unknown env {self.env!r}; expected one of {sorted(_ENV_PREFIX)}"
            ) from None

    def prefixed(self, name: str) -> str:
        """``add_env_prefix`` (`commons/utilities.py:172-182`)."""
        return f"{self.prefix}_{name}"

    def layer_path(self, layer: str, table: str) -> str:
        """Physical path of a layer table (reference
        `gs://<env>_<layer>/<db>/<table>/` shape, local-rooted here)."""
        return f"{self.warehouse_root}/{self.prefixed(layer)}/{table}"

    def secret(self, name: str) -> str:
        """Resolve through the provider chain; first hit wins."""
        for provider in self.secret_providers:
            val = provider(name)
            if val is not None:
                return val
        raise KeyError(f"secret {name!r} not found in any provider")

    def sql_params(self) -> dict[str, str]:
        """Template params for sql.run_sql (reference {project}/{env})."""
        return {"project": self.project, "env": self.prefix, **dict(self.extras)}
