"""Config-declared table registry.

Mirrors the reference's JSON table configs (`cig_tables.json` /
`cig_mailbox_tables.json`: ``{target_name, source, is_enabled, columns[]}``)
plus the reflected-SQL type metadata the transform keys off
(`ParquetFileInsertion.py:20`, `CigEolHostingIngestionLogic.py:44-118`):
per column — python type (str/int/datetime), nullable, declared length.

The registry is driver-side config (a handful of KB even with 52 tables x
427 columns) — it is broadcast implicitly by being captured in Column
expressions, never shipped as data.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    # Logical type authority, like the reflected SQL schema:
    # "str" | "int" | "datetime" (reference: c.type.python_type).
    ctype: str = "str"
    nullable: bool = True
    # None length on a str column == nvarchar(max) (truncate to 100k).
    length: int | None = 255


@dataclass(frozen=True)
class TableSpec:
    target_name: str
    source: str
    is_enabled: bool = True
    columns: tuple[ColumnSpec, ...] = field(default_factory=tuple)

    @property
    def column_names(self) -> list[str]:
        """Ordered — the column-order contract (`ParquetFileInsertion.py:30`)."""
        return [c.name for c in self.columns]

    def columns_of_type(self, ctype: str, nullable: bool | None = None) -> list[ColumnSpec]:
        out = []
        for c in self.columns:
            if c.ctype != ctype:
                continue
            if nullable is not None and c.nullable != nullable:
                continue
            out.append(c)
        return out


def load_catalog(path: str) -> dict[str, TableSpec]:
    """Load a `cig_tables.json`-shaped config file.

    Accepts both the reference shape (``columns`` as a list of names — all
    treated as nullable strings) and an extended shape where each column is
    ``{name, type, nullable, length}``.
    """
    with open(path) as f:
        raw = json.load(f)
    tables = raw["tables"] if isinstance(raw, dict) else raw
    catalog: dict[str, TableSpec] = {}
    for t in tables:
        cols = []
        for c in t.get("columns", []):
            if isinstance(c, str):
                cols.append(ColumnSpec(name=c))
            else:
                cols.append(
                    ColumnSpec(
                        name=c["name"],
                        ctype=c.get("type", "str"),
                        nullable=c.get("nullable", True),
                        length=c.get("length", 255),
                    )
                )
        spec = TableSpec(
            target_name=t["target_name"],
            source=t.get("source", t["target_name"]),
            is_enabled=t.get("is_enabled", True),
            columns=tuple(cols),
        )
        catalog[spec.source] = spec
    return catalog
