"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
transactional JSONL sink with task-level staging and driver-side commit.

Why this exists: the reference writes its JSON sidecars driver-side
(/root/reference/XGBoost.py:160-163); an engine needs the DISTRIBUTED
version — every task writes its partition, and the job is atomic: the
driver's commit() publishes staged task files only when all tasks
succeeded, abort() discards them (the two-phase pattern every real sink
— Kafka/Iceberg/JDBC — implements). Task retries are safe: each task
attempt stages to a unique file and only committed attempts publish.

POSIX-filesystem sink by design: staging + publish use os.replace
(atomic rename), which maps to a local/NFS/HDFS-fuse mount. On an
object store the same two-phase shape needs the store's primitives
(multipart-upload complete, or a manifest commit) — swap write/commit
bodies, keep the protocol. The os.path.exists in abort() runs on
staged TEMP paths this writer itself created, never as a
does-the-dataset-exist probe (that pattern is sources.io.try_read_parquet).

Usage:
    spark.dataSource.register(JsonlSinkDataSource)
    df.write.format("jsonl_staged").mode("append")
      .option("path", "/out/dir").save()
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _Staged(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_staged requires .option('path', ...)")

    def write(self, iterator):
        # executor-side: stage this task's rows under a unique temp name
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(
            self.path, "_staging", f"task-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Staged(staged, n)

    def commit(self, messages):
        # driver-side, runs once ALL tasks succeeded: atomically publish
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged_path, final)
        total = sum(m.n_rows for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"rows": total, "files": len(messages)}))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_staged"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options)
