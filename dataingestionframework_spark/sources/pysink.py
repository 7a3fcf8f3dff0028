"""Custom Python DataSource WRITER: an ndjson directory sink with a
manifest-based atomic commit, in batch AND streaming form.

Completes the Python DataSource surface the synthetic corpus source
opened (sources/synthetic.py covers the batch + streaming READ paths;
this covers WRITE). The commit protocol is the part worth copying:

- executors write part files under uncommitted names and return the
  file list as their WriterCommitMessage;
- the driver's ``commit`` writes ONE manifest (json) naming every part
  of the attempt — readers resolve the directory through manifests, so
  a crashed attempt's orphan parts are invisible (same pointer-swap
  idea as catalog/table.py, scaled down to a sink);
- the streaming form writes one manifest per epoch, keyed by batchId —
  a REPLAYED epoch overwrites its own manifest idempotently instead of
  double-counting (exactly-once for free, same trick as
  ingest/pipeline.py's epoch ledger);
- ``abort`` removes the attempt's parts.

Scale: each partition writes independently (no driver data path); the
driver only sees file names. Swap ndjson for parquet/Arrow by replacing
the ``_dump`` serializer — the protocol is format-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _Parts(WriterCommitMessage):
    files: tuple = ()


def _dump(path: str, iterator) -> int:
    n = 0
    with open(path, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    return n


class _NdjsonWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_dir: 'path' option is required")
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.ndjson")
        _dump(out, iterator)
        return _Parts(files=(out,))

    def commit(self, messages):
        files = [f for m in messages if m for f in m.files]
        manifest = {"files": sorted(os.path.basename(f) for f in files)}
        with open(os.path.join(self.path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        for m in messages:
            if m:
                for f in m.files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass


class _NdjsonStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_dir: 'path' option is required")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.ndjson")
        _dump(out, iterator)
        return _Parts(files=(out,))

    def commit(self, messages, batchId: int):
        files = [f for m in messages if m for f in m.files]
        manifest = {"batch": batchId,
                    "files": sorted(os.path.basename(f) for f in files)}
        # keyed by epoch: a replayed batch REPLACES its manifest, so its
        # first attempt's parts become unreferenced instead of doubled
        with open(os.path.join(self.path, f"_epoch-{batchId}.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int):
        for m in messages:
            if m:
                for f in m.files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass


class NdjsonDirDataSource(DataSource):
    """``df.write.format("ndjson_dir").mode("append").option("path",
    d).save()`` and ``df.writeStream.format("ndjson_dir")...`` —
    register with ``spark.dataSource.register(NdjsonDirDataSource)``.
    (Python data sources accept only Append/Overwrite save modes.)"""

    @classmethod
    def name(cls) -> str:
        return "ndjson_dir"

    def schema(self) -> StructType:  # writer-only source
        return StructType([])

    def writer(self, schema, overwrite: bool):
        return _NdjsonWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _NdjsonStreamWriter(self.options)


def committed_rows(path: str) -> list[dict]:
    """Read back ONLY manifest-referenced rows (batch manifest + every
    epoch manifest) — orphan parts from failed attempts are ignored."""
    names: set[str] = set()
    for f in os.listdir(path):
        if f == "_manifest.json" or f.startswith("_epoch-"):
            with open(os.path.join(path, f)) as fh:
                names.update(json.load(fh)["files"])
    rows: list[dict] = []
    for name in sorted(names):
        with open(os.path.join(path, name)) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    return rows
