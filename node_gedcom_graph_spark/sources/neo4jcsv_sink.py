"""Neo4j bulk-CSV SINK as a Spark Python DataSource writer — the
reference's partitioned CSV fan-out and atomic publish (ops 18, 21-23:
`lib/csv_writer.js:85-113`, `lib/neo4j.js:20-51`) re-expressed as a
first-class ``df.write.format("neo4jcsv")`` connector with real
task-commit semantics:

- each TASK writes one CSV part file into a job-unique STAGING
  directory and returns a commit message (path, row count);
- ``commit`` runs once on the driver after every task succeeded:
  part files move into the final directory in one pass, then a
  ``_manifest.json`` (file list, per-file rows, the ``--nodes`` /
  ``--relationships`` argv fragment the reference accumulates at
  `index.js:80-84`) is written LAST — readers treat the manifest as
  the commit marker, so a crash between moves publishes nothing;
- ``abort`` removes the staging directory — a failed/partial job
  leaves the destination untouched, the reference's failed-import
  contract (`lib/neo4j.js:102-109`).

This completes the custom-connector story: the GEDCOM DataSource
(sources/gedcom_datasource.py) covers batch/stream READ paths; this
module covers the WRITE path of the same DataSource API.

Scale: tasks never coordinate (one file per partition, names are
partition-unique); the only driver work is renames + one small JSON.
On an object store the renames become copy-free metadata commits the
same way FileOutputCommitter v2 publishes.
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import uuid
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class Neo4jCsvWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.columns = schema.fieldNames()
        self.dest = options["path"]
        self.family = options.get("family", "nodes")
        if self.family not in ("nodes", "relationships"):
            raise ValueError(f"family must be nodes|relationships: {self.family}")
        self.tag = options.get("tag", "ALL")
        self.overwrite = overwrite
        # staging is job-unique so two concurrent writes cannot collide
        self.staging = os.path.join(
            self.dest, f"_staging-{uuid.uuid4().hex[:12]}"
        )

    def write(self, iterator: Iterator) -> _PartFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.staging, exist_ok=True)
        name = f"{self.family}-{self.tag}-part{pid:05d}.csv"
        path = os.path.join(self.staging, name)
        n = 0
        with open(path, "w", newline="", encoding="utf-8") as fh:
            w = csv.writer(fh)
            w.writerow(self.columns)  # schema-first header (not
            # first-record-wins: the reference quirk SURVEY §7.3 rejects)
            for row in iterator:
                w.writerow(["" if v is None else v for v in row])
                n += 1
        return _PartFile(path, n)

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        os.makedirs(self.dest, exist_ok=True)
        final = []
        for m in messages:
            if m is None:
                continue
            dst = os.path.join(self.dest, os.path.basename(m.path))
            os.replace(m.path, dst)
            final.append({"file": os.path.basename(m.path), "rows": m.rows})
        manifest = {
            "family": self.family,
            "tag": self.tag,
            "files": final,
            "total_rows": sum(f["rows"] for f in final),
            "import_args": [
                f"--{self.family}",
                ",".join(
                    os.path.join(self.dest, f["file"]) for f in final
                ),
            ],
        }
        # manifest last: its presence IS the commit
        tmp = os.path.join(self.dest, "_manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, os.path.join(self.dest, "_manifest.json"))
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class Neo4jCsvDataSource(DataSource):
    """``spark.dataSource.register(Neo4jCsvDataSource)`` then
    ``df.write.format("neo4jcsv").option("family", "nodes")
    .option("tag", "INDI").mode("append").save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "neo4jcsv"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return Neo4jCsvWriter(schema, self.options, overwrite)
