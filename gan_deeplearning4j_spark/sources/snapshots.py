"""Versioned snapshot table layout: manifest-tracked parquet with time
travel, append/overwrite commits, optimistic concurrency, rollback and
vacuum — the lakehouse transaction surface (Delta/Iceberg shape) built
from nothing but parquet files and atomic JSON manifest swaps.

Why this exists: `layouts.py` gives the engine partitioned / bucketed /
Z-ordered physical layouts and `merge_into` row-level upserts; what was
missing is the TABLE-VERSION axis — "read the table as of commit N",
"roll back the bad load", "two writers must not clobber each other".
The mechanism is the standard log-structured one (same idea as Delta's
`_delta_log`, re-derived for this engine):

- every commit writes NEW immutable parquet files under `data/v{N}/`,
  then publishes `manifests/v{N}.json` listing the table's full file
  set (append commits = previous set + new files — no rewrite);
- `HEAD` is a one-line pointer file swapped atomically via
  ``os.replace`` on a same-directory temp file, so readers see either
  the old or the new version, never a torn state;
- optimistic concurrency: a commit carrying ``expected_version`` fails
  with :class:`SnapshotConflictError` if HEAD moved — the caller
  re-reads and retries (writer-wins-by-CAS, exactly Delta's protocol);
- time travel = reading an old manifest's file list; rollback = a NEW
  commit whose manifest is a byte-copy of the old one (history is
  append-only, the bad version stays auditable);
- `vacuum` deletes data files unreachable from the last ``keep_last``
  manifests (the GC that makes overwrite commits reclaimable).

Scale: manifests hold file PATHS (O(files), kilobytes at 100 TB if
files are sized by `compact_parquet`); data moves only through Spark
parquet jobs; nothing here ever collects table rows to the driver.
Local-FS note: atomicity relies on same-filesystem rename — on object
stores you'd swap HEAD through a conditional PUT, same protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflictError(RuntimeError):
    """Another writer committed since the version this commit was based on."""


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "manifests")
        self._data_dir = os.path.join(path, "data")
        self._head = os.path.join(path, "HEAD")

    # -- internal ----------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version}.json")

    def _read_manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise ValueError(
                f"snapshot: version {version} does not exist at {self.path}"
            )
        with open(p) as f:
            return json.load(f)

    def _publish(self, manifest: dict, expected_version: int | None) -> int:
        """CAS-publish: write manifest v{N+1}, then atomically swap HEAD."""
        head = self.version()
        if expected_version is not None and head != expected_version:
            raise SnapshotConflictError(
                f"snapshot: expected HEAD v{expected_version}, found "
                f"v{head} — concurrent commit; re-read and retry"
            )
        new_version = (head if head is not None else -1) + 1
        manifest["version"] = new_version
        manifest["committed_at"] = time.time()
        mp = self._manifest_path(new_version)
        os.makedirs(self._manifest_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        # claim the version slot with an exclusive link: os.link fails with
        # FileExistsError if a racing writer already published v{N+1}, so
        # the manifest write itself is the atomic CAS (a read-then-replace
        # would silently clobber the loser's history). Some filesystems
        # (FUSE/object-store mounts, SMB) reject hardlinks outright with
        # EPERM/ENOTSUP — fall back to an O_CREAT|O_EXCL exclusive create
        # there, which is the same lose-the-race-loudly contract.
        try:
            os.link(tmp, mp)
        except FileExistsError:
            raise SnapshotConflictError(
                f"snapshot: version v{new_version} already committed"
            ) from None
        except OSError:
            # Hardlink-free path, still ATOMIC for readers: the race is
            # decided by an exclusive-create CLAIM file, then the fully
            # written tmp manifest is published with os.replace — a
            # reader can never observe a partial v{N}.json (writing the
            # content through the O_EXCL fd directly would expose the
            # slot before its bytes exist). A writer crashing between
            # claim and publish leaves v{N}.json.claim without
            # v{N}.json — a diagnosable stale claim, named in the
            # conflict error, never a parse of an empty manifest.
            claim = mp + ".claim"
            try:
                os.close(os.open(claim, os.O_CREAT | os.O_EXCL))
            except FileExistsError:
                raise SnapshotConflictError(
                    f"snapshot: version v{new_version} already committed "
                    f"(or a crashed writer left a stale {claim!r} — see "
                    "repair_stale_claims())"
                ) from None
            try:
                # A manifest published by another writer must not be
                # clobbered. Retry the exclusive link FIRST: if the
                # filesystem only rejected it transiently (mixed-capability
                # mounts), the race against a link-path writer is decided
                # atomically here, inside the claim. Only when link is
                # genuinely unsupported do we take exists+replace — and
                # then every concurrent writer is a fallback writer too
                # (link capability is a property of the mount, not the
                # process), so the claim file serializes the check-replace
                # window and the TOCTOU is closed by construction.
                try:
                    os.link(tmp, mp)
                except FileExistsError:
                    raise SnapshotConflictError(
                        f"snapshot: version v{new_version} already "
                        "committed"
                    ) from None
                except OSError:
                    if os.path.exists(mp):
                        raise SnapshotConflictError(
                            f"snapshot: version v{new_version} already "
                            "committed"
                        ) from None
                    os.replace(tmp, mp)
            finally:
                os.unlink(claim)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(str(new_version))
        os.replace(tmp, self._head)
        return new_version

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write df as immutable parquet files in a fresh subdir; return
        their paths (relative to the table root, so tables are movable)."""
        sub = os.path.join(self._data_dir, uuid.uuid4().hex[:12])
        df.write.mode("error").parquet(sub)
        rel = os.path.relpath(sub, self.path)
        return sorted(
            os.path.join(rel, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )

    # -- public ------------------------------------------------------------
    def repair_stale_claims(self, min_age_sec: float = 300.0) -> list[str]:
        """Remove orphaned ``v{N}.json.claim`` files left by a fallback
        writer that crashed between claiming a version slot and publishing
        its manifest. Such a claim permanently blocks the slot (every later
        commit raises ``SnapshotConflictError``), so this is the explicit
        recovery path — deliberately NOT automatic inside ``commit``:
        auto-reclaim by age would race a slow live writer under clock skew,
        turning its eventual publish into a silent double-commit. An
        operator (or a scheduled janitor that knows the deployment's
        commit-latency bound) calls this instead.

        Only claims with NO matching manifest are candidates (a claim next
        to a published manifest is already harmless debris), and only when
        older than ``min_age_sec`` — generous headroom over any sane
        manifest-write latency. Returns the removed paths."""
        import glob as _glob

        removed: list[str] = []
        now = time.time()
        for claim in _glob.glob(
            os.path.join(self._manifest_dir, "v*.json.claim")
        ):
            manifest = claim[: -len(".claim")]
            if os.path.exists(manifest):
                continue
            try:
                age = now - os.stat(claim).st_mtime
            except OSError:
                continue  # vanished — its writer published or repaired
            if age >= min_age_sec:
                try:
                    os.unlink(claim)
                    removed.append(claim)
                except OSError:
                    pass
        return removed

    def version(self) -> int | None:
        """Current HEAD version, or None for a not-yet-created table."""
        if not os.path.exists(self._head):
            return None
        with open(self._head) as f:
            return int(f.read().strip())

    def commit(
        self, df: DataFrame, mode: str = "append",
        expected_version: int | None = None,
    ) -> int:
        """Publish a new version. ``mode='append'`` adds df's files to the
        previous file set (no rewrite — the scale path for loads);
        ``mode='overwrite'`` replaces the logical content (old files stay
        on disk for time travel until `vacuum`). Pass ``expected_version``
        for optimistic concurrency."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"snapshot: unknown commit mode {mode!r}")
        files = self._write_data(df)
        head = self.version()
        if mode == "append" and head is not None:
            files = self._read_manifest(head)["files"] + files
        return self._publish(
            {"files": files, "operation": mode}, expected_version
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the table as of ``version`` (default: HEAD) — time travel
        is just scanning an old manifest's immutable file list."""
        head = self.version()
        if head is None:
            raise ValueError(f"snapshot: no commits at {self.path}")
        v = head if version is None else version
        files = self._read_manifest(v)["files"]
        if not files:
            raise ValueError(f"snapshot: v{v} is empty")
        return spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def history(self) -> list[dict]:
        """All committed versions, oldest first: version / operation /
        file count / commit time."""
        head = self.version()
        out = []
        for v in range((head if head is not None else -1) + 1):
            m = self._read_manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                    "committed_at": m["committed_at"],
                }
            )
        return out

    def rollback(self, to_version: int,
                 expected_version: int | None = None) -> int:
        """Publish a NEW version with the old version's file list — the
        bad commits remain in history (auditable), but HEAD reads as of
        ``to_version`` again."""
        old = self._read_manifest(to_version)
        return self._publish(
            {"files": old["files"], "operation": f"rollback:v{to_version}"},
            expected_version,
        )

    def vacuum(self, keep_last: int = 1) -> int:
        """Delete data directories unreachable from the last ``keep_last``
        manifests (older manifests stay but their time travel breaks —
        exactly Delta's VACUUM contract). Returns directories removed."""
        head = self.version()
        if head is None:
            return 0
        keep = range(max(0, head - keep_last + 1), head + 1)
        live = set()
        for v in keep:
            for f in self._read_manifest(v)["files"]:
                live.add(os.path.dirname(f))
        removed = 0
        if not os.path.isdir(self._data_dir):
            return 0
        for sub in sorted(os.listdir(self._data_dir)):
            rel = os.path.join(os.path.relpath(self._data_dir, self.path), sub)
            if rel not in live:
                shutil.rmtree(os.path.join(self._data_dir, sub))
                removed += 1
        return removed
