"""Registry/config loading (reference src/config/settings.py:44-78,
src/config/models.py:65-102 — YAML registry validated into typed models)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

from nyc_open_data_pipeline_spark.pipeline.schema import TableSchema

SOURCE_TYPES = ("socrata", "census_api", "shapefile_download", "url_download")


@dataclass
class DatasetEntry:
    key: str
    name: str
    source_type: str
    dataset_id: str
    table_name: str
    transformer: str
    enabled: bool = True
    update_frequency: str | None = None

    def __post_init__(self):
        if self.source_type not in SOURCE_TYPES:
            raise ValueError(
                f"{self.key}: unknown source_type {self.source_type!r}; "
                f"expected one of {SOURCE_TYPES}"
            )


@dataclass
class DatasetConfig:
    entry: DatasetEntry
    api: dict = field(default_factory=dict)
    schema: TableSchema | None = None
    raw: dict = field(default_factory=dict)


def load_registry(path: str) -> dict[str, DatasetEntry]:
    with open(path) as f:
        doc = yaml.safe_load(f)
    out = {}
    for key, d in (doc.get("datasets") or {}).items():
        out[key] = DatasetEntry(
            key=key,
            name=d.get("name", key),
            source_type=d["source_type"],
            dataset_id=str(d["dataset_id"]),
            table_name=d["table_name"],
            transformer=d["transformer"],
            enabled=bool(d.get("enabled", True)),
            update_frequency=d.get("update_frequency"),
        )
    return out


def load_dataset_config(registry_path: str, key: str) -> DatasetConfig:
    registry = load_registry(registry_path)
    if key not in registry:
        raise KeyError(f"dataset {key!r} not in registry ({sorted(registry)})")
    entry = registry[key]
    cfg_path = os.path.join(os.path.dirname(registry_path), key, "config.yaml")
    raw: dict = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = yaml.safe_load(f) or {}
    schema = None
    if "schema" in raw:
        schema = TableSchema.from_dict(
            {"table_name": entry.table_name, **raw["schema"]}
        )
    return DatasetConfig(entry=entry, api=raw.get("api", {}), schema=schema, raw=raw)
