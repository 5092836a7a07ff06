"""Secret resolution chain (SURVEY §2 C4).

The reference resolves its FRED API key through an ordered chain —
managed vault first, environment variable fallback, hard error when
both miss (reference: core_local/azure_fred_scraper.py:39-52; vault
client wiring core_local/azure_connector.py). This module re-expresses
that contract with the vault as an INJECTED callable (any managed
secret store is a ``name -> str`` lookup behind its SDK), plus the
file-per-secret convention used by container orchestrators (a mounted
secrets directory), so the chain runs anywhere without a proprietary
SDK:

    1. explicit overrides mapping          (tests, ad-hoc runs)
    2. injected vault callable             (the Key-Vault seam)
    3. environment variable                (reference fallback)
    4. ``<secrets_dir>/<name>`` file       (mounted-secrets convention)

Vault lookups that RAISE are treated as misses and the chain continues
— mirroring the reference's try/except-warn-then-env behavior. A fully
missed required secret raises ``KeyError`` like the reference's
``ValueError`` on a missing API key; ``required=False`` returns None.

Names are normalized the way the reference's two chains disagree on
purpose: vaults commonly forbid underscores ("FRED-API-KEY") while env
vars forbid dashes ("FRED_API_KEY") — each provider sees the name in
its own convention, so one logical name hits both.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping
from pathlib import Path

VaultLookup = Callable[[str], str]


class SecretChain:
    """Ordered secret resolver: overrides -> vault -> env -> file."""

    def __init__(
        self,
        overrides: Mapping[str, str] | None = None,
        vault: VaultLookup | None = None,
        secrets_dir: str | os.PathLike | None = None,
        environ: Mapping[str, str] | None = None,
    ):
        self.overrides = dict(overrides or {})
        self.vault = vault
        self.secrets_dir = Path(secrets_dir) if secrets_dir else None
        self.environ = environ if environ is not None else os.environ

    @staticmethod
    def _vault_name(name: str) -> str:
        return name.replace("_", "-")

    @staticmethod
    def _env_name(name: str) -> str:
        return name.replace("-", "_")

    def get(self, name: str, required: bool = True) -> str | None:
        """Resolve ``name`` through the chain; KeyError when a required
        secret misses every provider."""
        env_name, vault_name = self._env_name(name), self._vault_name(name)
        for key in (name, env_name, vault_name):
            if key in self.overrides:
                return self.overrides[key]
        if self.vault is not None:
            try:
                val = self.vault(vault_name)
                if val:
                    return val
            except Exception:  # noqa: BLE001 — reference warns and falls through
                pass
        val = self.environ.get(env_name)
        if val:
            return val
        if self.secrets_dir is not None:
            f = self.secrets_dir / env_name
            if f.is_file():
                return f.read_text().strip()
        if required:
            raise KeyError(
                f"secret {name!r} not found in overrides, vault, environment, "
                f"or secrets dir"
            )
        return None
