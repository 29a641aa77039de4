"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic events generator with partition planning, filter pushdown and
Arrow-batched reads.

Why it exists: the engine's extension surface. A user of the reference
reads CSVs; an engine at 100 TB also ingests from systems Spark has no
built-in connector for (internal feeds, quota services, test-data
generators). Spark 4's Python DataSource API is the sanctioned way to
add one without JVM code - this module is the worked example, built the
way a production connector should be:

  * ``partitions()`` plans N contiguous row ranges -> N parallel tasks;
    parallelism is an option, not an accident of file layout.
  * ``pushFilters`` accepts ``event_type = 'x'`` equality predicates, so
    the generator SKIPS non-matching rows at the source (the same
    contract as parquet's PushedFilters; everything else is returned to
    Spark for post-scan evaluation).
  * ``read()`` yields pyarrow RecordBatches computed by numpy - the
    vectorized fast path of the API; a tuple-per-row generator would be
    the row-at-a-time Python this repo bans everywhere else.
  * all columns are pure hash functions of event_id, so any two scans -
    any partitioning, any pushdown - agree row-for-row (retry-safe,
    oracle-testable).

Register once per session, then it is a normal format:

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SimEventsDataSource)
    spark.read.format("sim_events").option("rows", 1e6).load()

(The conf is required because this reader implements ``pushFilters``;
Spark hard-fails a pushdown-capable Python reader when the feature
flag is off, rather than silently skipping the pushdown.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

EVENT_TYPES = ["click", "purchase", "error", "signup", "view"]


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SimEventsDataSource(DataSource):
    """``format("sim_events")``: options rows (default 10_000),
    partitions (default 8), users (default 1_000)."""

    @classmethod
    def name(cls) -> str:
        return "sim_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, value double"
        )

    def reader(self, schema) -> "SimEventsReader":
        return SimEventsReader(self.options)


class SimEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(float(options.get("rows", 10_000)))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.n_users = max(1, int(options.get("users", 1_000)))
        self.pushed_type: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("event_type",)
                and isinstance(f.value, str)
                and self.pushed_type is None
            ):
                self.pushed_type = f.value  # handled at the source
            else:
                yield f  # Spark evaluates the rest post-scan

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil-div
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        # every column is a pure function of event_id: deterministic
        # across retries, repartitioning, and pushdown
        type_idx = (ids * 40503 + 13) % len(EVENT_TYPES)
        if self.pushed_type in EVENT_TYPES:
            ids = ids[type_idx == EVENT_TYPES.index(self.pushed_type)]
            type_idx = (ids * 40503 + 13) % len(EVENT_TYPES)
        users = (ids * np.int64(2654435761)) % self.n_users
        value = ((ids * 97) % 10_000).astype(np.float64) / 100.0
        types = np.array(EVENT_TYPES, dtype=object)[type_idx]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(users, type=pa.int64()),
                pa.array(types, type=pa.string()),
                pa.array(value, type=pa.float64()),
            ],
            names=["event_id", "user_id", "event_type", "value"],
        )
