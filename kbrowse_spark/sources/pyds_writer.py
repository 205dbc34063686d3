"""Custom Python data source WRITER (Spark 4 `pyspark.sql.datasource`):
a JSONL sink with task-temp files + driver-side commit — the write-path
counterpart of the custom readers in ``pyds.py`` / ``pyds_stream.py``,
completing the connector story (batch read, stream read, batch write).

The reference engine's only sink is the pioneer-protocol JSON stream on
an HTTP response (`/root/reference/src/kbrowse/search.clj:25-32` emits
`[`, pioneer row, result rows…); a distributed engine needs the same
row-JSON rendering but with parallel writes and exactly-once publish.
This sink implements the standard two-phase commit contract Spark's
writer API provides:

* ``write`` (executor, once per task): render the task's Arrow batches
  to a UNIQUE temp file (`_tmp/<uuid>.jsonl`) and return a commit
  message naming it — task retries/speculation produce orphan temps,
  never visible output.
* ``commit`` (driver, all tasks succeeded): rename each committed temp
  to a collision-free `part-NNNNN.jsonl` (numbered past anything on
  disk), write `_MANIFEST.json` (files + row counts), and only then
  retire parts the new manifest does not reference — readers treat the
  manifest as the publish point, so a crash at ANY step leaves the
  previously published manifest and every file it names intact.
* ``abort``: delete temps.

At 100 TB the same class shape targets an object store (multipart
upload per task, manifest swap on commit) — the contract demonstrated
here (unique temp names, commit-message-driven publish, manifest-last)
is exactly what makes that exactly-once.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclasses.dataclass
class JsonlCommit(WriterCommitMessage):
    tmp_name: str
    rows: int


class PioneerJsonlWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pioneer_jsonl sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):  # executor-side, once per task
        import json
        import os
        import uuid

        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        rows = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            for batch in iterator:
                # JSONL is a stringly wire format (the reference's
                # pioneer rows) — per-row rendering is inherent to the
                # sink, not UDF overhead; Arrow still carries the data
                # to the task zero-copy.
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, default=str, sort_keys=True))
                    f.write("\n")
                    rows += 1
        return JsonlCommit(tmp_name=name, rows=rows)

    def commit(self, messages):  # driver-side, after ALL tasks succeed
        import glob
        import json
        import os
        import re
        import shutil

        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        prior_files: list[dict] = []
        if not self.overwrite:
            # Append: carry forward the previously PUBLISHED files (the
            # manifest is the publish point, so only it counts as prior
            # output).
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    prior_files = json.load(f).get("files", [])
        # In BOTH modes, new parts get collision-free names past every
        # part file on disk (including unpublished crash leftovers) and
        # stale parts are deleted only AFTER the new manifest publishes:
        # a crash at any point leaves the previous manifest's files
        # intact, so the publish remains atomic for readers.
        base = 0
        existing = glob.glob(os.path.join(self.path, "part-*.jsonl"))
        for p in existing:
            m = re.fullmatch(r"part-(\d+)\.jsonl", os.path.basename(p))
            if m:
                base = max(base, int(m.group(1)) + 1)
        files = list(prior_files)
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{base + i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, "_tmp", m.tmp_name),
                os.path.join(self.path, final),
            )
            files.append({"file": final, "rows": m.rows})
        # Manifest LAST: its appearance is the atomic publish point.
        manifest = {"type": "pioneer", "files": files,
                    "total_rows": sum(f["rows"] for f in files)}
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        if self.overwrite:
            # Only after the new manifest is live: retire parts the new
            # manifest does not reference.
            live = {f["file"] for f in files}
            for p in existing:
                if os.path.basename(p) not in live:
                    os.remove(p)
        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)

    def abort(self, messages):  # driver-side, on task failure
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class PioneerJsonlStreamWriter(DataSourceStreamArrowWriter):
    """Streaming flavor of the sink: the same task-temp discipline, but
    commit is PER MICRO-BATCH and keyed by ``batchId`` — batch output
    files are `batch-<id>-part-<i>.jsonl` plus a batch manifest, and a
    replayed batch (restart recovery) first deletes its own prior
    files, making the commit idempotent: exactly-once output on top of
    the checkpointed source offsets, the same contract
    ``stream_foreachbatch_export`` demonstrates with built-in sinks."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pioneer_jsonl sink requires option 'path'")

    # executor-side: identical temp-file protocol as the batch writer
    write = PioneerJsonlWriter.write

    def commit(self, messages, batchId: int) -> None:  # driver, per batch
        import glob
        import json
        import os

        for p in glob.glob(os.path.join(self.path, f"batch-{batchId:05d}-*")):
            os.remove(p)  # replayed batch: idempotent re-publish
        files = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"batch-{batchId:05d}-part-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, "_tmp", m.tmp_name),
                os.path.join(self.path, final),
            )
            files.append({"file": final, "rows": m.rows})
        manifest = {
            "type": "pioneer",
            "batch_id": batchId,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        tmp = os.path.join(self.path, f"_BATCH_{batchId:05d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(
            tmp, os.path.join(self.path, f"_BATCH_{batchId:05d}_MANIFEST.json")
        )

    def abort(self, messages, batchId: int) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class PioneerJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pioneer_jsonl"

    def writer(self, schema, overwrite: bool):
        return PioneerJsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return PioneerJsonlStreamWriter(self.options, overwrite)


def register_pioneer_jsonl_sink(spark) -> None:
    """Idempotently register the sink on a session (cloudpickle
    by-value so executors don't need this module on their path)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(PioneerJsonlDataSource)
