"""Spark 4 Python DataSource API source AND sink (S-family depth).

A deterministic synthetic source implemented against the public
``pyspark.sql.datasource`` API (SPARK-44076, Spark 4.x): 8 range
partitions, each yielding (id, val = id*id mod 97) rows.  The point is the
PLUMBING — a user-defined source that partitions correctly (one
InputPartition per parallel split, no driver-side row generation) and
integrates with the DataFrame reader — with output simple enough that a
DuckDB ``range()`` oracle can hash-grade the full scan.

Scale notes: partitions() is the contract that makes a Python source
parallel — each partition is read independently on an executor (the class
is pickled to workers), so a real source (e.g. a paginated API or a
proprietary file format) scales horizontally exactly like a file scan.
Row-by-row yield is the slow path at 100 TB; the API also accepts
pyarrow.RecordBatch yields for vectorized reads — kept row-based here
because the relation is 10k rows by construction.
"""

from __future__ import annotations

N_ROWS = 10_000
N_PARTS = 8
MOD = 97

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class SynthQuadraticSource(DataSource):
        """``spark.read.format("synth_quadratic")`` — deterministic rows."""

        @classmethod
        def name(cls) -> str:
            return "synth_quadratic"

        def schema(self) -> str:
            return "id BIGINT, val BIGINT"

        def reader(self, schema) -> "SynthQuadraticReader":
            return SynthQuadraticReader()

    class SynthQuadraticReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(N_PARTS)]

        def read(self, partition):
            per = N_ROWS // N_PARTS
            start = partition.value * per
            for i in range(start, start + per):
                yield (i, (i * i) % MOD)

    class _ShardCommit(WriterCommitMessage):
        """Picklable per-task receipt: (temp file, final shard name, rows)."""

        def __init__(self, tmp: str, final: str, n_rows: int):
            self.tmp = tmp
            self.final = final
            self.n_rows = n_rows

    class ShardedJsonlSink(DataSource):
        """``df.write.format("sharded_jsonl").save(path)`` — the WRITE half
        of the Python DataSource surface (the reader above covers the scan
        half): one JSONL shard per task, published through the real
        two-phase commit protocol. Executors write to temp-named files and
        return a commit message; ONLY the driver-side commit() renames
        them to their final shard names and writes a `_MANIFEST.json`
        (shard list + row counts), so a failed/aborted job leaves no
        half-visible shard — the same task-temp + driver-publish contract
        every Hadoop-style committer implements. abort() removes the temp
        files. Local-FS rename here; on an object store the same protocol
        runs with a copy-then-delete or conditional PUT.

        Scale: rows stream through each task (nothing driver-side but the
        O(tasks) receipt list); shard sizing follows the upstream
        partitioning, so `df.repartition(n)` is the knob."""

        @classmethod
        def name(cls) -> str:
            return "sharded_jsonl"

        def writer(self, schema, overwrite: bool) -> "JsonlShardWriter":
            return JsonlShardWriter(self.options["path"], overwrite)

    class JsonlShardWriter(DataSourceWriter):
        def __init__(self, path: str, overwrite: bool):
            self.path = path
            self.overwrite = overwrite

        def write(self, iterator) -> "_ShardCommit":
            """Executor-side: stream rows to a temp-named JSONL file."""
            import json
            import os
            import uuid

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _ShardCommit(tmp, f"shard-{pid:05d}.jsonl", n)

        def _sweep_tmp(self) -> None:
            """Remove leftover .tmp-*.jsonl from failed or speculatively
            retried task attempts. Called ONLY in overwrite mode, whose
            semantics declare this writer the directory's sole owner — in
            append mode a concurrent writer's not-yet-committed temps may
            legitimately coexist here, and sweeping them would make that
            writer's commit fail at its rename."""
            import glob
            import os

            for leftover in glob.glob(
                    os.path.join(self.path, ".tmp-*.jsonl")):
                try:
                    os.remove(leftover)
                except FileNotFoundError:
                    pass

        def commit(self, messages) -> None:
            """Driver-side publish: rename temps, then write the manifest
            LAST (readers treat the manifest as the commit marker). In
            overwrite mode, stale shards from a previous larger write are
            removed AFTER the manifest swap — the committed manifest is
            never left referencing deleted files (a crash mid-cleanup
            leaves extra stale shards, which the next overwrite removes,
            rather than a manifest pointing at nothing), and once the
            cleanup finishes a `*.jsonl` glob also sees exactly this
            commit's data."""
            import glob
            import json
            import os

            shards = []
            for m in messages:
                os.replace(m.tmp, os.path.join(self.path, m.final))
                shards.append({"shard": m.final, "n_rows": m.n_rows})
            manifest = os.path.join(self.path, "_MANIFEST.json")
            with open(manifest + ".tmp", "w") as f:
                json.dump(sorted(shards, key=lambda s: s["shard"]), f)
            os.replace(manifest + ".tmp", manifest)
            if self.overwrite:
                new_names = {m.final for m in messages}
                for old in glob.glob(os.path.join(self.path, "*.jsonl")):
                    if os.path.basename(old) not in new_names:
                        os.remove(old)
                self._sweep_tmp()

        def abort(self, messages) -> None:
            import os

            for m in messages:
                try:
                    os.remove(m.tmp)
                except FileNotFoundError:
                    pass
            if self.overwrite:
                self._sweep_tmp()

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class SynthQuadraticStreamSource(DataSource):
        """``spark.readStream.format("synth_quadratic_stream")`` — the
        SAME deterministic rows as the batch source, delivered as a
        STREAM in fixed offset chunks (Spark 4 Python streaming data
        source, SPARK-45525). The offset is a plain row position, so
        exactly-once replay (``readBetweenOffsets``) is a slice — the
        contract a real cursor/paginated-API source must honor for
        checkpoint recovery: a re-read between committed offsets must
        return the identical rows."""

        @classmethod
        def name(cls) -> str:
            return "synth_quadratic_stream"

        def schema(self) -> str:
            return "id BIGINT, val BIGINT"

        def simpleStreamReader(self, schema) -> "SynthQuadraticStreamReader":
            return SynthQuadraticStreamReader()

    class SynthQuadraticStreamReader(SimpleDataSourceStreamReader):
        BATCH = 2_500  # 4 micro-batches over the 10k synthetic rows

        @staticmethod
        def _rows(lo: int, hi: int):
            # a LIST iterator, not a generator: the prefetch cache
            # copy.copy()s the iterator it hands to each micro-batch
            # (datasource_internal.py), and generators are not copyable
            return iter([(i, (i * i) % MOD) for i in range(lo, hi)])

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def read(self, start: dict):
            pos = int(start["pos"])
            end = min(pos + self.BATCH, N_ROWS)
            return self._rows(pos, end), {"pos": end}

        def readBetweenOffsets(self, start: dict, end: dict):
            return self._rows(int(start["pos"]), int(end["pos"]))

        def commit(self, end: dict) -> None:
            pass  # nothing to release: the synthetic cursor is stateless

    HAVE_PY_DATASOURCE = True
except ImportError:  # pragma: no cover - pyspark < 4 fallback
    SynthQuadraticSource = None  # type: ignore[assignment]
    SynthQuadraticStreamSource = None  # type: ignore[assignment]
    SynthQuadraticStreamReader = None  # type: ignore[assignment]
    ShardedJsonlSink = None  # type: ignore[assignment]
    HAVE_PY_DATASOURCE = False
