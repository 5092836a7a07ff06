"""Secret-chain contract tests (mirror of the reference's vault->env
fallback, core_local/azure_fred_scraper.py:39-52)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.secrets import SecretChain


def test_vault_wins_over_env():
    chain = SecretChain(
        vault=lambda n: {"FRED-API-KEY": "from-vault"}[n],
        environ={"FRED_API_KEY": "from-env"},
    )
    assert chain.get("FRED_API_KEY") == "from-vault"


def test_vault_error_falls_through_to_env():
    def broken(_name):
        raise RuntimeError("vault unreachable")

    chain = SecretChain(vault=broken, environ={"FRED_API_KEY": "from-env"})
    assert chain.get("FRED_API_KEY") == "from-env"


def test_name_convention_bridging():
    # one logical name resolves whether spelled vault-style or env-style
    chain = SecretChain(environ={"FRED_API_KEY": "x"})
    assert chain.get("FRED-API-KEY") == "x"
    chain = SecretChain(vault=lambda n: {"FRED-API-KEY": "v"}[n], environ={})
    assert chain.get("FRED_API_KEY") == "v"


def test_file_provider_and_required_miss(tmp_path):
    (tmp_path / "DB_PASSWORD").write_text("s3cret\n")
    chain = SecretChain(secrets_dir=tmp_path, environ={})
    assert chain.get("DB-PASSWORD") == "s3cret"
    assert chain.get("MISSING", required=False) is None
    with pytest.raises(KeyError):
        chain.get("MISSING")


def test_overrides_short_circuit_everything():
    chain = SecretChain(
        overrides={"FRED_API_KEY": "override"},
        vault=lambda n: "vault",
        environ={"FRED_API_KEY": "env"},
    )
    assert chain.get("FRED-API-KEY") == "override"


def test_feeds_fred_fetcher_url(tmp_path):
    # e2e seam: resolved key lands in the FRED URL, never in the cache key
    from econdatapipeline_spark.registry import DatasetSpec
    from econdatapipeline_spark.sources.http_fetch import fred_url

    chain = SecretChain(environ={"FRED_API_KEY": "abc123"})
    spec = DatasetSpec(
        name="federal_funds_rate",
        source="fred",
        value_columns=("rate",),
        fred_series_id="DFF",
        frequency="m",
    )
    url = fred_url(spec, chain.get("FRED_API_KEY"))
    assert "api_key=abc123" in url and "series_id=DFF" in url
