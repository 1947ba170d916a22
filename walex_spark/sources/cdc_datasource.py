"""Custom Structured Streaming source for CDC polling (PySpark ≥4
Python Data Source API) — the polished form of sources/jdbc.py's manual
polling loop (SURVEY.md §2.2 "custom DataSourceStreamReader").

`spark.readStream.format("walex_cdc")` turns cursor-keyed polling into
a first-class streaming source: offsets are cursor positions, so
checkpointing, exactly-once replay, and backpressure all come from the
engine instead of hand-rolled loops:

  - ``latestOffset`` polls the upstream's max cursor (driver-side
    metadata query — in production a `SELECT max(cursor)` over JDBC);
  - ``partitions(start, end)`` splits the (start, end] cursor window
    into N range partitions — the same parallel-pull shape JDBC's
    partitionColumn gives a batch read;
  - ``read(partition)`` runs on executors and scans only its cursor
    range (predicate pushdown into the remote scan / parquet filter);
  - ``commit(end)`` is the offset-ack hook — the standby-status-update
    of the reference (server.ex:154-162): optionally persists the
    cursor to an ack file so an external slot manager could trim WAL.

No Postgres lives in this container, so the "remote table" is a parquet
directory read with pyarrow inside ``read`` (NOT via Spark — executors
see plain Python here); swapping in a JDBC range query changes only
that function's body.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T


class CursorRange(InputPartition):
    def __init__(self, path: str, cursor_field: str, start: int, end: int):
        self.path = path
        self.cursor_field = cursor_field
        self.start = start
        self.end = end


def _scan_rows(path: str, cursor_field: str, lo: int, hi: int, schema: T.StructType):
    """Executor-side range scan of the stand-in table (pyarrow)."""
    import pyarrow.dataset as ds

    from datetime import datetime, timezone

    dataset = ds.dataset(path, format="parquet")
    flt = (ds.field(cursor_field) > lo) & (ds.field(cursor_field) <= hi)
    table = dataset.to_table(filter=flt)
    names = [f.name for f in schema.fields]
    maps = {f.name for f in schema.fields if isinstance(f.dataType, T.MapType)}
    tss = {f.name for f in schema.fields if isinstance(f.dataType, T.TimestampType)}

    def conv(name, v):
        if v is None:
            return None
        if name in maps:
            return dict(v)
        if name in tss and isinstance(v, datetime) and v.tzinfo is None:
            # parquet instants come back tz-naive from pyarrow; Spark's
            # serializer needs aware datetimes (session tz is UTC)
            return v.replace(tzinfo=timezone.utc)
        return v

    for row in table.to_pylist():
        yield tuple(conv(n, row[n]) for n in names)


class CdcStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self.path = options["path"]
        self.cursor_field = options.get("cursorfield", "lsn_lo")
        self.num_partitions = int(options.get("numpartitions", "4"))
        self.ack_path = options.get("ackpath")
        self.start_cursor = int(options.get("startcursor", "-1"))

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"cursor": self.start_cursor}

    def latestOffset(self) -> dict:
        """Driver-side poll of the upstream high-water mark (the JDBC
        analog is `SELECT max(cursor_field) FROM table`).

        Reads parquet row-group STATISTICS, not data: the driver cost
        is O(footers), constant per file regardless of row count. Only
        a fragment whose footer lacks min/max stats falls back to
        scanning that one fragment's cursor column."""
        import pyarrow.dataset as ds

        if not os.path.isdir(self.path) or not any(
            f.endswith(".parquet") for f in _walk_files(self.path)
        ):
            return {"cursor": self.start_cursor}
        dataset = ds.dataset(self.path, format="parquet")
        mx = None
        for frag in dataset.get_fragments():
            frag_max = self._fragment_max_from_stats(frag)
            if frag_max is None:
                col = frag.to_table(columns=[self.cursor_field])[
                    self.cursor_field
                ].drop_null()
                vals = col.to_pylist()
                frag_max = max(vals) if vals else None
            if frag_max is not None:
                mx = frag_max if mx is None else max(mx, frag_max)
        return {"cursor": int(mx)} if mx is not None else {"cursor": self.start_cursor}

    def _fragment_max_from_stats(self, frag) -> int | None:
        """Max of the cursor column over one file via footer statistics;
        None when any row group lacks usable min/max."""
        md = frag.metadata
        try:
            col_idx = md.schema.names.index(self.cursor_field)
        except ValueError:
            return None
        frag_max = None
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(col_idx).statistics
            if st is None or not st.has_min_max:
                return None
            frag_max = st.max if frag_max is None else max(frag_max, st.max)
        return frag_max

    # -- planning ---------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["cursor"]), int(end["cursor"])
        if hi <= lo:
            return [CursorRange(self.path, self.cursor_field, lo, lo)]
        n = min(self.num_partitions, hi - lo)
        step = (hi - lo) / n
        bounds = [lo + round(i * step) for i in range(n)] + [hi]
        return [
            CursorRange(self.path, self.cursor_field, bounds[i], bounds[i + 1])
            for i in range(n)
            if bounds[i + 1] > bounds[i]
        ]

    # -- execution --------------------------------------------------------
    def read(self, partition: CursorRange) -> Iterator[tuple]:
        yield from _scan_rows(
            partition.path,
            partition.cursor_field,
            partition.start,
            partition.end,
            self._schema,
        )

    # -- ack --------------------------------------------------------------
    def commit(self, end: dict) -> None:
        """Offset committed by the engine — mirror it to the ack file
        (slot-advance hook; atomic like JdbcPollingSource.commit)."""
        if self.ack_path:
            tmp = f"{self.ack_path}.tmp"
            with open(tmp, "w") as f:
                json.dump(end, f)
            os.replace(tmp, self.ack_path)


def _walk_files(path: str):
    for root, _dirs, files in os.walk(path):
        for f in files:
            yield f


class CdcPollingDataSource(DataSource):
    """`spark.dataSource.register(CdcPollingDataSource)` then
    `spark.readStream.format("walex_cdc").schema(...).option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "walex_cdc"

    def schema(self):
        from walex_spark.model import CHANGE_ENVELOPE_SCHEMA

        return CHANGE_ENVELOPE_SCHEMA

    def streamReader(self, schema: T.StructType) -> CdcStreamReader:
        return CdcStreamReader(schema, self.options)
