"""Job configuration: the engine's "session conf".

Mirrors the reference's config surface and defaults (/root/reference/etl/etl.py:18-32,
110-125) and its dynamic kwarg coercion (etl/etl.py:90-99): a string that parses as
int becomes int, "true"/"True"/"false"/"False" become bool, everything else stays a
string.  Column lists are space-stripped then comma-split (etl/etl.py:141-146).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

DEFAULT_DELIMITER = ","
DEFAULT_X_COLUMN = "lon"
DEFAULT_Y_COLUMN = "lat"
DEFAULT_SRID = 4326
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_MAX_ATTEMPTS = 3
DEFAULT_FILE_ENCODING = "utf-8"

#: Values the reference refuses to treat as floats (etl/etl.py:32); they fall
#: through to the string path.  Case-insensitive full match.
FORBIDDEN_FLOAT_VALUES = ("INFINITY",)

#: Render format for timestamps at the SQL-text boundary (etl/etl.py:16).
CARTO_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss'+00'"

MAX_LON = 180.0
MAX_LAT = 90.0


def coerce_kwarg(value: Any) -> Any:
    """Reference kwarg coercion (etl/etl.py:90-99): int > bool > raw."""
    try:
        return int(value)
    except (ValueError, TypeError):
        if value in ("true", "True"):
            return True
        if value in ("false", "False"):
            return False
        return value


def _strip_list(csv_list: str | None) -> str | None:
    return csv_list.replace(" ", "") if csv_list is not None else None


@dataclass
class JobConfig:
    """Declarative job config.  Field names match the reference's config keys
    (etl.conf.example + README.md:65-103) so existing configs map 1:1."""

    table_name: str | None = None
    columns: str | None = None
    date_columns: str | None = None
    delimiter: str = DEFAULT_DELIMITER
    x_column: str = DEFAULT_X_COLUMN
    y_column: str = DEFAULT_Y_COLUMN
    srid: int = DEFAULT_SRID
    chunk_size: int = DEFAULT_CHUNK_SIZE
    max_attempts: int = DEFAULT_MAX_ATTEMPTS
    file_encoding: str = DEFAULT_FILE_ENCODING
    force_no_geometry: bool = False
    force_the_geom: str | None = None
    date_format: str | None = None
    datetime_format: str | None = None
    float_comma_separator: str | None = None
    float_thousand_separator: str | None = None
    observer: Any = None
    id_column: str | None = None

    # Engine extensions (not in the reference):
    #: fail the job on an exhausted-retry batch instead of silently skipping it
    #: (the reference skips, etl/etl.py:290-293); dead-letter rows are collected
    #: either way.
    skip_failed_batches: bool = False
    #: reproduce the reference's `coord or None` quirk where a 0.0 coordinate
    #: yields a NULL geometry (etl/etl.py:258) — off by default, it is a bug.
    compat_zero_coord_is_null: bool = False
    #: optional declared column types ("qty:double,when:timestamp,name:string")
    #: — skips the type-inference scan entirely (the reference has no declared
    #: schema; this is the engine's fast path for known feeds).
    column_types: str | None = None

    extras: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.columns = _strip_list(self.columns)
        self.date_columns = _strip_list(self.date_columns)

    @classmethod
    def from_kwargs(cls, **kwargs: Any) -> "JobConfig":
        """Build from loosely-typed (e.g. configparser) kwargs with reference
        coercion semantics.  Unknown keys land in ``extras`` instead of erroring,
        matching the reference's setattr-anything behavior."""
        known = {f.name for f in fields(cls)}
        cleaned: dict[str, Any] = {}
        extras: dict[str, Any] = {}
        for key, value in kwargs.items():
            coerced = coerce_kwarg(value)
            if key in known and key != "extras":
                cleaned[key] = coerced
            else:
                extras[key] = coerced
        cfg = cls(**cleaned)
        cfg.extras = extras
        return cfg

    # -- column-list helpers -------------------------------------------------
    @property
    def columns_list(self) -> list[str]:
        if not self.columns:
            return []
        return [c for c in self.columns.split(",") if c]

    @property
    def date_columns_list(self) -> list[str]:
        if not self.date_columns:
            return []
        return [c for c in self.date_columns.split(",") if c]

    @property
    def column_types_map(self) -> dict[str, str]:
        if not self.column_types:
            return {}
        out: dict[str, str] = {}
        for part in self.column_types.replace(" ", "").split(","):
            if part:
                name, _, typ = part.partition(":")
                out[name.lower()] = typ or "string"
        return out

    def is_date_column(self, column: str | None) -> bool:
        """Membership test as the reference defines it (etl/etl.py:219-220)."""
        return (
            column is not None
            and self.date_columns is not None
            and column in self.date_columns.split(",")
        )
