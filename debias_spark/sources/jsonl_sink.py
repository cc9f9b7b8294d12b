"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
JSON-lines sink with a two-phase commit.

The write side of the API mirrors the reader's partition contract:
``write(iterator)`` runs once per input partition ON THE EXECUTORS and
returns a WriterCommitMessage; ``commit(messages)`` runs ON THE DRIVER
only after every task succeeded, publishing a manifest — the same
task-attempt / job-commit split every production sink (file committers,
object stores) is built on.  Tasks stage to a ``.tmp`` name and
os.replace into place, so a retried task can never leave a torn file.

Paired with debias_spark/sources/synthetic.py (the read side); together
they cover both directions of the Python DataSource surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        # stage under a task-ATTEMPT-unique name: a speculative or zombie
        # attempt racing its retry must never truncate/interleave the
        # other attempt's staging file — only the atomic rename races,
        # and either winner is a complete file with the same rows
        tmp = f"{fname}.{ctx.taskAttemptId()}.tmp"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        os.replace(tmp, fname)  # task-atomic publish
        return JsonlCommitMessage(fname, n)

    def commit(self, messages) -> None:
        # driver-side job commit: the manifest names every task file and
        # its row count — readers that trust only manifested files get
        # exactly-once visibility even if stray task files survive.
        # Sweep orphaned attempt staging files here too: a failed-then-
        # retried task leaves its *.tmp behind on an ultimately
        # SUCCESSFUL job, which is the common path (abort only covers
        # failed jobs).
        self._sweep_tmp()
        files = [
            {"file": os.path.basename(m.filename), "rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        manifest = {
            "files": sorted(files, key=lambda d: d["file"]),
            "total_rows": sum(d["rows"] for d in files),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.filename)
                except OSError:
                    pass
        self._sweep_tmp()

    def _sweep_tmp(self) -> None:
        # failed/zombie task attempts leave attempt-unique *.tmp staging
        # files that no commit message names — sweep them on both commit
        # and abort, or the sink dir accumulates orphans forever (readers
        # glob-filter them out, but disk does not)
        import glob

        for tmp in glob.glob(os.path.join(self.path, "part-*.tmp")):
            try:
                os.remove(tmp)
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        # driver-side, before any task runs: overwrite clears the target
        # so a narrower re-write can't leave stale part files that a
        # part-* glob would double-count against the fresh manifest;
        # append is rejected (per-partition file names would REPLACE,
        # not append — silently wrong, so fail loudly)
        if not overwrite:
            raise NotImplementedError(
                "jsonl_sink supports mode('overwrite') only: task files "
                "are named by partition id, so append would replace them"
            )
        import shutil

        path = self.options["path"]
        shutil.rmtree(path, ignore_errors=True)
        return JsonlSinkWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
