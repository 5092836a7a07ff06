"""Dataset registry: schema-registry-as-data driving generic ingestion.

The reference declares every dataset's shape in config dicts
(reference: core_local/config.py:29-238 for 15 EDB datasets,
core_local/fred_config.py:20-154 for 10 FRED series,
core_local/nyu_config.py:18-24 for the NYU ERP workbook). This module
keeps that design: one declarative spec per dataset, consumed by the
generic normalizers in ``sources/`` and the warehouse catalog init
(reference: core_local/azure_connector.py:427-451).

At scale the registry is the source of truth for warehouse layout:
every dataset lands in one Parquet table partitioned by ``dataset`` so
``WHERE dataset = 'x'`` is partition pruning, not a scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class DatasetSpec:
    """One economic time series: where it comes from and how it lands."""

    name: str  # warehouse table / partition value
    source: str  # 'edb_monthly' | 'edb_quarterly' | 'fred' | 'nyu_stern'
    value_columns: tuple[str, ...]  # snake_case value column names
    value_type: str = "double"  # 'double' | 'long' (reference 'float'/'int')
    # EDB: workbook coordinates (reference: config.py:32-34)
    file_name: str | None = None
    sheet_name: str | None = None
    data_location: str | None = None
    # FRED: series & frequency (reference: fred_config.py:31-32)
    fred_series_id: str | None = None
    frequency: str = "m"  # 'm' monthly | 'q' quarterly | 'w' weekly
    extra: dict = field(default_factory=dict)

    @property
    def value_column(self) -> str:
        return self.value_columns[0]

    def spark_schema(self) -> T.StructType:
        vt = T.LongType() if self.value_type == "long" else T.DoubleType()
        fields = [T.StructField("date", T.DateType(), False)]
        fields += [T.StructField(c, vt, True) for c in self.value_columns]
        return T.StructType(fields)


def _edb(name, value_col, value_type, file_name, sheet_name, loc="A6:K18"):
    return DatasetSpec(
        name=name,
        source="edb_monthly",
        value_columns=(value_col,),
        value_type=value_type,
        file_name=file_name,
        sheet_name=sheet_name,
        data_location=loc,
    )


def _fred(name, value_col, value_type, series_id, frequency):
    return DatasetSpec(
        name=name,
        source="fred",
        value_columns=(value_col,),
        value_type=value_type,
        fred_series_id=series_id,
        frequency=frequency,
    )


# 15 EDB monthly datasets (reference: core_local/config.py:29-238).
EDB_SPECS: tuple[DatasetSpec, ...] = (
    _edb("autosales", "sales", "long", "I_AUTO.XLS", "AS01"),
    _edb("bankruptcies", "filings", "long", "I_BANKRUPT.XLS", "BAN01"),
    _edb("cementproduction", "production", "double", "I_CEMENT.XLS", "CD01"),
    _edb("electricityconsumption", "consumption", "double", "I_ENERGY.XLS", "EEC01"),
    _edb("gasprice", "price", "double", "I_GAS.XLS", "GAS01"),
    _edb("gasconsumption", "consumption", "double", "I_GAS.XLS", "GAS02"),
    _edb("laborparticipation", "rate", "double", "I_LABOR.XLS", "LF03"),
    _edb("unemploymentrate", "rate", "double", "I_LABOR.XLS", "LF08"),
    _edb("employmentrate", "rate", "double", "I_LABOR.XLS", "LF09"),
    _edb("unemploymentclaims", "claims", "long", "I_LABOR.XLS", "LF10"),
    _edb("tradeemployment", "employment", "double", "I_PAYROLL.XLS", "PE05"),
    _edb("consumerpriceindex", "index", "double", "I_PRICE.XLS", "CPI01"),
    _edb("transportationpriceindex", "index", "double", "I_PRICE.XLS", "CPI05"),
    _edb("retailsales", "sales", "double", "I_RETAIL.XLS", "RS01"),
    _edb("imports", "value", "double", "I_TRADE.XLS", "IMP01"),
)

# 10 FRED series (reference: core_local/fred_config.py:20-154).
FRED_SPECS: tuple[DatasetSpec, ...] = (
    _fred("federalfundsrate", "rate", "double", "DFF", "m"),
    _fred("automanufacturingorders", "orders", "double", "AMDMNO", "m"),
    _fred("usedcarretailsales", "sales", "double", "MRTSSM44112USN", "m"),
    _fred("domesticautoinventories", "inventories", "double", "AUINSA", "m"),
    _fred("domesticautoproduction", "production", "double", "DAUPSA", "m"),
    _fred("liquiditycreditfacilities", "facilities", "double", "WLCFLL", "m"),
    _fred("semiconductormanufacturingunits", "units", "double", "IPG3344S", "m"),
    _fred("aluminumneworders", "orders", "double", "AANMNO", "m"),
    _fred("realgdp", "gdp", "double", "GDPC1", "q"),
    _fred("gdpnowforecast", "forecast", "double", "GDPNOW", "q"),
)

# NYU Stern ERP workbook — one dataset, three value columns
# (reference: core_local/nyu_config.py:6-24).
NYU_SPEC = DatasetSpec(
    name="equityriskpremium",
    source="nyu_stern",
    value_columns=("tbond_rate", "erp_t12m", "expected_return"),
    value_type="double",
    sheet_name="Historical ERP",
)

ALL_SPECS: tuple[DatasetSpec, ...] = EDB_SPECS + FRED_SPECS + (NYU_SPEC,)
SPECS_BY_NAME: dict[str, DatasetSpec] = {s.name: s for s in ALL_SPECS}

# System tables (reference: core_local/azure_connector.py:434-444 names the
# 26 data tables plus 'datarevisions' and 'scrapermetadata').
REVISIONS_TABLE = "datarevisions"
METADATA_TABLE = "scrapermetadata"

# data_date is a string key (ISO date for time-series datasets): the
# reference stores it exactly so (azure_data_tracker.py:77-80,119), and a
# string key lets the same audit table serve non-date merge keys (e.g.
# the streaming event_id upsert).
REVISIONS_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("data_date", T.StringType(), False),
        T.StructField("value_field", T.StringType(), False),
        T.StructField("old_value", T.DoubleType(), True),
        T.StructField("new_value", T.DoubleType(), True),
        T.StructField("revision_date", T.TimestampType(), False),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("last_run", T.TimestampType(), False),
    ]
)


def all_table_names() -> list[str]:
    """All warehouse tables: 26 datasets + 2 system tables."""
    return [s.name for s in ALL_SPECS] + [REVISIONS_TABLE, METADATA_TABLE]
