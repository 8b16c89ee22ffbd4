"""Snapshot-versioned table store — Iceberg-style state for the crawl.

In production this layer IS Apache Iceberg: each crawl round ends in one
``MERGE INTO``/append per table and one snapshot commit, giving resumable
state with per-snapshot lineage (BASELINE.json north_rule). The Iceberg
runtime jars are not available in this sandbox, so the same contract is
implemented directly over parquet:

- every write is copy-on-write into a fresh ``snap_<n>`` directory,
- a JSON manifest records the snapshot chain per table with row counts and
  caller-supplied lineage metadata (the per-round fetch/dedup/extract metrics),
- reads always go through the manifest's *current* snapshot, so readers are
  isolated from in-flight writes and any snapshot can be rolled back to.

This replaces the reference's mutable MySQL tables (schema/scraped_pages.sql,
schema/robots_rules.sql) where state transitions are row-at-a-time UPDATEs
(models.py:156-171); here a round's state transition is one bulk dataframe
write + an atomic manifest swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VCOL = "_snap_v"


def lww_latest(df: DataFrame, key: str, v_col: str = _VCOL) -> DataFrame:
    """Last-writer-wins per key over a versioned union of delta snapshots.

    One ``max_by(struct(cols), version)`` hash aggregation (map-side partial
    agg, single shuffle on the key) — the merge-on-read resolution step for
    delta-chained tables. Shuffle size is O(delta rows), NOT O(table rows):
    callers only feed the delta chain through this, never the base.
    """
    cols = [c for c in df.columns if c not in (key, v_col)]
    packed = F.struct(*[F.col(c) for c in cols])
    agg = df.groupBy(key).agg(F.max_by(packed, F.col(v_col)).alias("_r"))
    return agg.select(F.col(key), *[F.col(f"_r.{c}").alias(c) for c in cols])


def commit_order(snap: dict) -> tuple:
    """Total order over snapshot commits within one store.

    ``commit_seq`` is the store-wide monotonic counter every write/write_ref
    mints under the single-manifest commit point, so it orders commits
    correctly even across wall-clock steps (an NTP correction can make
    ``time.time()`` go BACKWARD between two commits, which would invert a
    wall-time comparison). Snapshots from manifests written before the
    counter existed fall back to wall_time and sort before every
    seq-stamped commit — they really are older, since the counter exists
    from the first post-upgrade write onward.
    """
    if "commit_seq" in snap:
        return (1, snap["commit_seq"])
    return (0, snap.get("wall_time", 0.0))


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers (no Spark job — metadata only).

    Iceberg manifests carry these counts natively; this is the local-parquet
    equivalent. Cuts one full read-back job per snapshot commit.
    """
    import pyarrow.dataset as ds

    try:
        return ds.dataset(path, format="parquet", partitioning="hive").count_rows()
    except Exception:
        return -1  # count unavailable; lineage still records the snapshot


class SnapshotStore:
    """Versioned parquet tables under one root directory."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    # -- manifest ----------------------------------------------------------
    def _load(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"tables": {}}

    def _save(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit

    @staticmethod
    def _next_commit_seq(manifest: dict) -> int:
        """Mint the next store-wide commit sequence number (see
        ``commit_order``). Stored in the manifest root, so it is monotonic
        across ALL tables and survives crashes with the same atomic rename
        that commits the snapshot itself."""
        seq = manifest.get("commit_seq", 0)
        manifest["commit_seq"] = seq + 1
        return seq

    def _abs(self, path: str) -> str:
        """Manifest paths are root-relative so a store survives relocation
        (copy/mount elsewhere); absolute entries from older stores still
        resolve as-is."""
        return path if os.path.isabs(path) else os.path.join(self.root, path)

    def abspath(self, path: str) -> str:
        """Absolute filesystem path of a manifest-recorded snapshot path."""
        return self._abs(path)

    # -- writes ------------------------------------------------------------
    @staticmethod
    def partitions_for(rows: int, rows_per_file: int = 250_000) -> int:
        """Write-parallelism for a known row count: ~128 MB files, capped.

        Small deltas must not inherit the session's 32 shuffle partitions —
        a chain of snapshots each made of 32 near-empty files multiplies
        every later scan's task count and file-listing cost.
        """
        return max(1, min(200, rows // rows_per_file + 1))

    def _cut_orphans(self, manifest: dict, name: str, tbl: dict) -> list[str]:
        """Drop manifest entries past ``current`` (Iceberg branch cut) —
        except reference snapshots, whose files are owned by another
        table's lifecycle (see ``write_ref``), and files another table's
        ref snapshots still point at.

        A cut orphan that survives only because a ref still points at it
        loses its manifest entry (it must: entries at ids <= the NEXT write's
        id would re-enter the read chain), so its path is parked on the
        manifest's ``detached`` list — ``_gc_detached`` reclaims it once the
        last ref is gone. Without that list the directory would be reachable
        from no manifest entry after the ref compacts away: a permanent leak.

        Returns the orphans' data directories for the CALLER to delete
        AFTER the manifest commit (review r5): deleting here — before the
        parquet write and ``_save`` — destroyed committed rollback targets
        when the write then crashed, while the on-disk manifest still
        listed them (the exact corruption the copy-on-write contract
        forbids). A crash after commit but before the deferred deletion
        merely leaks unreferenced directories, which is safe.
        """
        if tbl["current"] is None:
            return []
        orphans = [s for s in tbl["snapshots"] if s["id"] > tbl["current"]]
        tbl["snapshots"] = [s for s in tbl["snapshots"] if s["id"] <= tbl["current"]]
        refs = self._externally_referenced(manifest, exclude=name) if orphans else set()
        doomed: list[str] = []
        for s in orphans:
            if s["meta"].get("ref"):
                continue  # files belong to another table's lifecycle
            p = os.path.normpath(self._abs(s["path"]))
            if p in refs:
                detached = manifest.setdefault("detached", [])
                if s["path"] not in detached:
                    detached.append(s["path"])
            else:
                doomed.append(self._abs(s["path"]))
        return doomed

    def _gc_detached(self, manifest: dict) -> None:
        """Delete detached snapshot directories no ref points at anymore."""
        detached = manifest.get("detached")
        if not detached:
            return
        live = {
            os.path.normpath(self._abs(s["path"]))
            for t in manifest["tables"].values()
            for s in t["snapshots"]
        }
        keep = []
        for p in detached:
            if os.path.normpath(self._abs(p)) in live:
                keep.append(p)
            else:
                shutil.rmtree(self._abs(p), ignore_errors=True)
        manifest["detached"] = keep

    def write_ref(
        self,
        name: str,
        path: str,
        rows: int,
        meta: dict | None = None,
    ) -> int:
        """Register an EXISTING snapshot directory as this table's next
        snapshot — a manifest-only commit, zero Spark jobs, zero data copy
        (the Iceberg analogue: two tables' manifest lists naming the same
        data files).

        The referenced files stay owned by the table that wrote them: this
        table never deletes them (orphan cuts and ``prune`` skip ``ref``
        snapshots), and callers must guarantee the owner's lifecycle keeps
        them alive for as long as this table's chain can reach them — in the
        crawl that holds because nothing prunes frontier deltas and the
        coordinated rollback rewinds both tables together.

        ``rows`` is caller-supplied (the referenced file may contain MORE
        rows than this table's read-time view of it — e.g. a frontier round
        delta of which only the pending rows are seen keys).
        """
        manifest = self._load()
        tbl = manifest["tables"].setdefault(name, {"snapshots": [], "current": None})
        snap_id = (tbl["snapshots"][-1]["id"] + 1) if tbl["snapshots"] else 0
        doomed = self._cut_orphans(manifest, name, tbl)
        tbl["snapshots"].append(
            {
                "id": snap_id,
                "path": path,
                "rows": rows,
                "wall_time": time.time(),
                "commit_seq": self._next_commit_seq(manifest),
                "meta": {**(meta or {}), "ref": True},
            }
        )
        tbl["current"] = snap_id
        self._save(manifest)
        for p in doomed:  # only after the commit — see _cut_orphans
            shutil.rmtree(p, ignore_errors=True)
        return snap_id

    def write(
        self,
        name: str,
        df: DataFrame,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
        coalesce: int | None = None,
    ) -> int:
        """Write ``df`` as the table's next snapshot; returns the snapshot id.

        Copy-on-write: the previous snapshot stays on disk until pruned, so a
        failed write never corrupts current state (crash before the manifest
        swap ⇒ the old snapshot is still current — this is the resume
        guarantee exercised by tests/test_resume.py).
        """
        manifest = self._load()
        tbl = manifest["tables"].setdefault(name, {"snapshots": [], "current": None})
        # snapshot ids are NEVER reused (Iceberg semantics): Spark caches file
        # listings per path session-wide, so re-writing a discarded snapshot's
        # directory would serve stale listings to later readers
        snap_id = (tbl["snapshots"][-1]["id"] + 1) if tbl["snapshots"] else 0
        # a write after a rollback commits the rolled-back state as the new
        # head: discard the stale forward chain (Iceberg-style branch cut) so
        # chain-reading tables (delta snapshots) never see orphaned futures.
        # Their data files are deleted only AFTER the manifest commit below
        # — a crash during the (possibly long) parquet write must leave
        # every snapshot the on-disk manifest lists intact (review r5).
        doomed = self._cut_orphans(manifest, name, tbl)
        rel_path = os.path.join(name, f"snap_{snap_id:05d}")
        path = os.path.join(self.root, rel_path)
        if coalesce is not None:
            df = df.coalesce(coalesce)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        rows = _parquet_rows(path)
        tbl["snapshots"].append(
            {
                "id": snap_id,
                "path": rel_path,
                "rows": rows,
                "wall_time": time.time(),
                "commit_seq": self._next_commit_seq(manifest),
                "meta": meta or {},
            }
        )
        tbl["current"] = snap_id
        self._save(manifest)
        for p in doomed:  # only after the commit — see _cut_orphans
            shutil.rmtree(p, ignore_errors=True)
        return snap_id

    # -- reads -------------------------------------------------------------
    def exists(self, name: str) -> bool:
        tbl = self._load()["tables"].get(name)
        return bool(tbl and tbl["current"] is not None)

    def current_snapshot(self, name: str) -> dict | None:
        tbl = self._load()["tables"].get(name)
        if not tbl or tbl["current"] is None:
            return None
        return next(s for s in tbl["snapshots"] if s["id"] == tbl["current"])

    def read(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        tbl = self._load()["tables"].get(name)
        if not tbl:
            raise KeyError(f"no such table: {name}")
        sid = tbl["current"] if snapshot_id is None else snapshot_id
        snap = next(s for s in tbl["snapshots"] if s["id"] == sid)
        return self.spark.read.parquet(self._abs(snap["path"]))

    def read_chain(self, name: str) -> DataFrame:
        """Union of the snapshot chain up to current, starting at the last
        snapshot marked ``meta={"base": True}`` (a full rewrite/compaction).

        This is the append-only read path: tables whose writes are deltas
        (e.g. the seen set's per-round new keys) are the union of the base
        plus subsequent deltas — the Iceberg manifest-list equivalent.
        """
        tbl = self._load()["tables"].get(name)
        if not tbl or tbl["current"] is None:
            raise KeyError(f"no such table: {name}")
        chain = [s for s in tbl["snapshots"] if s["id"] <= tbl["current"]]
        start = 0
        for i, s in enumerate(chain):
            if s["meta"].get("base"):
                start = i
        paths = [self._abs(s["path"]) for s in chain[start:]]
        # per-path reads unioned: a single multi-root read trips partition
        # discovery (CONFLICTING_DIRECTORY_STRUCTURES) on hive-partitioned
        # snapshot dirs with different roots
        df = self.spark.read.parquet(paths[0])
        for p in paths[1:]:
            df = df.unionByName(self.spark.read.parquet(p))
        return df

    def chain_parts(self, name: str) -> list[dict]:
        """Snapshot records from the last base (inclusive) up to current.

        ``parts[0]`` is the base (a full rewrite / compaction / first write);
        the rest are deltas in commit order. This is the manifest-list view a
        merge-on-read reader needs.
        """
        tbl = self._load()["tables"].get(name)
        if not tbl or tbl["current"] is None:
            raise KeyError(f"no such table: {name}")
        chain = [s for s in tbl["snapshots"] if s["id"] <= tbl["current"]]
        start = 0
        for i, s in enumerate(chain):
            if s["meta"].get("base"):
                start = i
        return [{**s, "path": self._abs(s["path"])} for s in chain[start:]]

    def read_merged(
        self,
        name: str,
        key: str,
        broadcast_keys_limit: int = 4_000_000,
    ) -> DataFrame:
        """Merge-on-read view of a delta-chained table (Iceberg MoR equivalent).

        row for ``key`` = the latest version across (base, delta_1, …, delta_n):

        - deltas resolve last-writer-wins (`lww_latest`, shuffle O(delta rows)),
        - base rows survive unless superseded — a LEFT ANTI join whose right
          side is just the delta key set; when the manifest row counts bound
          it under ``broadcast_keys_limit`` the anti-join is a broadcast,
          so the base is only ever SCANNED (no shuffle of the big side).

        Writers keep per-round commits O(touched rows); periodic compaction
        (a ``base`` write of this merged view) bounds the delta chain.
        """
        parts = self.chain_parts(name)
        base = self.spark.read.parquet(parts[0]["path"])
        if len(parts) == 1:
            return base
        deltas = None
        delta_rows = 0
        for p in parts[1:]:
            d = self.spark.read.parquet(p["path"]).withColumn(
                _VCOL, F.lit(p["id"])
            )
            deltas = d if deltas is None else deltas.unionByName(d)
            delta_rows = -1 if (delta_rows < 0 or p["rows"] < 0) else delta_rows + p["rows"]
        latest = lww_latest(deltas, key).select(*base.columns)
        keys = latest.select(key)
        if 0 <= delta_rows <= broadcast_keys_limit:
            keys = F.broadcast(keys)
        return base.join(keys, on=key, how="left_anti").unionByName(latest)

    def chain_length(self, name: str) -> int:
        """Number of delta snapshots since the last base (compaction signal)."""
        tbl = self._load()["tables"].get(name)
        if not tbl or tbl["current"] is None:
            return 0
        chain = [s for s in tbl["snapshots"] if s["id"] <= tbl["current"]]
        n = 0
        for s in chain:
            n = 0 if s["meta"].get("base") else n + 1
        return n

    def lineage(self, name: str) -> list[dict]:
        """Snapshot chain with per-snapshot metadata (round metrics)."""
        tbl = self._load()["tables"].get(name)
        return list(tbl["snapshots"]) if tbl else []

    def update_meta(self, name: str, **kv) -> None:
        """Merge keys into the CURRENT snapshot's metadata (manifest-only,
        atomic — no data write). Used for cheap watermarks, e.g. the robots
        coverage checkpoint, where rewriting the table would be waste."""
        manifest = self._load()
        tbl = manifest["tables"][name]
        snap = next(s for s in tbl["snapshots"] if s["id"] == tbl["current"])
        snap["meta"].update(kv)
        self._save(manifest)

    # -- admin -------------------------------------------------------------
    def rollback(self, name: str, snapshot_id: int) -> None:
        manifest = self._load()
        tbl = manifest["tables"][name]
        if not any(s["id"] == snapshot_id for s in tbl["snapshots"]):
            raise KeyError(f"{name}: no snapshot {snapshot_id}")
        tbl["current"] = snapshot_id
        self._save(manifest)

    def _externally_referenced(self, manifest: dict, exclude: str) -> set[str]:
        """Absolute paths that OTHER tables' ``ref`` snapshots point at.

        A ref snapshot (``write_ref``) names data files owned by a different
        table — e.g. the seen set's zero-copy refs into frontier round
        deltas. Pruning the owner table must not delete files another
        table's live chain can still reach.
        """
        return {
            os.path.normpath(self._abs(s["path"]))
            for tname, t in manifest["tables"].items()
            if tname != exclude
            for s in t["snapshots"]
            if s["meta"].get("ref")
        }

    def prune(self, name: str, keep_last: int = 2) -> None:
        """Drop all but the newest ``keep_last`` snapshots' data files.

        Snapshots whose files are referenced by another table's chain (the
        seen set's zero-copy frontier refs) are retained — manifest entry and
        files — so the referencing chain never dangles; a later prune after
        the ref is compacted away releases them.

        The ENTIRE current chain (last base snapshot through ``current``)
        is always retained regardless of ``keep_last`` (review r5): the
        window used to count raw snapshots, so on a delta-chained table it
        could delete the chain's base — after which ``chain_parts`` would
        silently promote the oldest surviving delta to base and
        merge-on-read would lose every row not touched since. Pruning a
        chained table therefore only ever drops snapshots OLDER than the
        current base; run a compaction first to shrink the chain itself.
        """
        manifest = self._load()
        tbl = manifest["tables"].get(name)
        if not tbl:
            return
        refs = self._externally_referenced(manifest, exclude=name)
        keep = {s["id"] for s in tbl["snapshots"][-keep_last:]} | {tbl["current"]}
        if tbl["current"] is not None:
            base_id = None
            for s in tbl["snapshots"]:
                if s["id"] <= tbl["current"] and s["meta"].get("base"):
                    base_id = s["id"]
            if base_id is not None:
                keep |= {
                    s["id"]
                    for s in tbl["snapshots"]
                    if base_id <= s["id"] <= tbl["current"]
                }
        kept = []
        for s in tbl["snapshots"]:
            if (
                s["id"] in keep
                or os.path.normpath(self._abs(s["path"])) in refs
            ):
                kept.append(s)
            elif not s["meta"].get("ref"):  # ref files belong to another table
                shutil.rmtree(self._abs(s["path"]), ignore_errors=True)
        tbl["snapshots"] = kept
        self._gc_detached(manifest)  # reclaim cut orphans whose refs are gone
        self._save(manifest)
