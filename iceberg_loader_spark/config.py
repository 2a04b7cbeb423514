"""LoaderConfig: frozen config object + validation.

Field-for-field parity with the reference's pydantic ``LoaderConfig``
(``/root/reference src/iceberg_loader/core/config.py:21-92``) and its
validation rules (exercised by ``tests/test_config_validation.py``):

* ``write_mode`` ∈ {append, overwrite}
* ``join_cols`` (upsert) and ``replace_filter`` are mutually exclusive
  (config.py:82-83)
* ``join_cols`` must be non-empty when given
* ``commit_interval`` must be >= 0 (0 ⇒ flush every batch; the buffer
  limit is ``max(1, commit_interval)``, loader.py:214)
* ``load_ts_col`` must be a valid identifier (config.py:54-59)
* identity-partitioning on the load-timestamp column is rejected
  (config.py:85-91)
* partition expression must parse (delegates to tables/partitioning.py)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from iceberg_loader_spark.tables.partitioning import (
    PartitionField,
    parse_partition_transform,
)

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

WRITE_MODES = ("append", "overwrite")


class ConfigError(ValueError):
    """Invalid loader configuration."""


@dataclass(frozen=True)
class LoaderConfig:
    write_mode: str = "append"
    partition_by: str | None = None
    replace_filter: str | None = None
    join_cols: tuple[str, ...] | None = None
    commit_interval: int = 1
    schema_evolution: bool = False
    load_timestamp: bool = True
    load_ts_col: str = "_load_dttm"
    batch_size: int = 10000
    table_properties: dict = field(default_factory=dict)
    # row-level operation mode for upsert (join_cols) and replace_filter:
    # "cow" rewrites affected files (read-optimized, reference parity);
    # "mor" records equality-delete files / delete predicates and defers
    # the rewrite to compaction (write-optimized — the high-frequency
    # ingest posture at 100 TB)
    row_level_mode: str = "cow"

    def __post_init__(self):
        if self.write_mode not in WRITE_MODES:
            raise ConfigError(
                f"write_mode must be one of {WRITE_MODES}, got {self.write_mode!r}"
            )
        if self.join_cols is not None:
            object.__setattr__(self, "join_cols", tuple(self.join_cols))
            if len(self.join_cols) == 0:
                raise ConfigError("join_cols must be non-empty when provided")
            for c in self.join_cols:
                if not _IDENT_RE.match(c):
                    raise ConfigError(f"invalid join column name: {c!r}")
        if self.row_level_mode not in ("cow", "mor"):
            raise ConfigError(
                f"row_level_mode must be 'cow' or 'mor', got "
                f"{self.row_level_mode!r}"
            )
        if self.join_cols and self.replace_filter:
            raise ConfigError("join_cols (upsert) and replace_filter are mutually exclusive")
        if self.commit_interval < 0:
            raise ConfigError(f"commit_interval must be >= 0, got {self.commit_interval}")
        if self.batch_size <= 0:
            raise ConfigError(f"batch_size must be positive, got {self.batch_size}")
        if not _IDENT_RE.match(self.load_ts_col):
            raise ConfigError(f"invalid load_ts_col name: {self.load_ts_col!r}")
        if self.partition_by is not None:
            pf = parse_partition_transform(self.partition_by)  # raises on bad expr
            if (
                self.load_timestamp
                and pf.transform == "identity"
                and pf.source == self.load_ts_col
            ):
                raise ConfigError(
                    "identity partitioning on the load-timestamp column "
                    "creates one partition per load — rejected "
                    "(reference core/config.py:85-91)"
                )

    @property
    def partition_field(self) -> PartitionField | None:
        if self.partition_by is None:
            return None
        return parse_partition_transform(self.partition_by)

    @property
    def buffer_limit(self) -> int:
        """Batches per flush (reference core/loader.py:214)."""
        return max(1, self.commit_interval)
