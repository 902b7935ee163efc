"""Snapshot table: append-only manifests, time travel, copy-on-write delete.

The north-rule storage contract names Iceberg tables; this module
re-expresses the three Iceberg mechanics that matter to the engine over
plain parquet directories (the sandbox has no catalog service; the
protocol is catalog-agnostic and maps 1:1 onto Iceberg):

* **Snapshots + manifests** — every write produces a new immutable
  snapshot manifest (``metadata/v<N>.json``) listing the data segments
  valid AS OF that snapshot, each with row count and key min/max column
  stats (Iceberg's manifest-file stats).
* **Time travel** — ``read(as_of=N)`` plans the scan purely from the
  manifest: older snapshots stay readable because segments are immutable
  and never deleted by subsequent commits.
* **Copy-on-write delete with stats pruning** — ``delete_range`` carries
  forward UNTOUCHED segments by reference (their key range misses the
  predicate — Iceberg's manifest-level pruning) and rewrites only the
  intersecting segments.  Planning is driver-side metadata work (bounded:
  one manifest, no data rows); every rewrite is a distributed job.

At 100 TB this is exactly the Iceberg execution shape: O(segments)
driver-side planning, scans touch only live segments, deletes rewrite
only the files whose stats intersect the predicate.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """Append/delete with snapshot isolation over a parquet directory."""

    def __init__(self, root: str, key_col: str):
        self.root = root
        self.key_col = key_col
        os.makedirs(f"{root}/metadata", exist_ok=True)

    # -- manifest protocol ---------------------------------------------------

    def _manifest_path(self, snap_id: int) -> str:
        return f"{self.root}/metadata/v{snap_id:05d}.json"

    def current_id(self) -> int:
        ids = [
            int(f[1:6]) for f in os.listdir(f"{self.root}/metadata")
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(ids) if ids else 0

    def _load(self, snap_id: int) -> list[dict]:
        with open(self._manifest_path(snap_id)) as fh:
            return json.load(fh)["segments"]

    def _commit(self, snap_id: int, segments: list[dict]) -> None:
        tmp = self._manifest_path(snap_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"snapshot": snap_id, "segments": segments}, fh)
        os.replace(tmp, self._manifest_path(snap_id))

    def _write_segment(self, df: DataFrame, snap_id: int, seq: int) -> dict:
        path = f"{self.root}/data/seg-{snap_id:05d}-{seq}"
        df.write.mode("overwrite").parquet(path)
        # Iceberg's write-then-stat contract: manifest stats describe the
        # BYTES ON DISK, not a second evaluation of the input plan — a
        # non-deterministic source would otherwise yield kmin/kmax that
        # disagree with the file, and delete_range/merge stats pruning
        # would silently carry a segment that contains matched keys.
        # (Also avoids double-executing every segment's plan; the re-read
        # aggregate is a footer-bounded parquet scan of 2 columns.)
        written = df.sparkSession.read.parquet(path)
        stats = written.agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(self.key_col).alias("kmin"),
            F.max(self.key_col).alias("kmax"),
        ).collect()[0]
        return {
            "path": path, "rows": int(stats["rows"]),
            "kmin": None if stats["kmin"] is None else int(stats["kmin"]),
            "kmax": None if stats["kmax"] is None else int(stats["kmax"]),
        }

    # -- operations ----------------------------------------------------------

    def append(self, df: DataFrame) -> int:
        """Commit a new snapshot = previous segments + one new segment."""
        prev_id = self.current_id()
        snap_id = prev_id + 1
        segments = self._load(prev_id) if prev_id else []
        segments = segments + [self._write_segment(df, snap_id, 0)]
        self._commit(snap_id, segments)
        return snap_id

    def delete_range(self, spark: SparkSession, lo: int, hi: int
                     ) -> tuple[int, int, int]:
        """Copy-on-write delete of key ∈ [lo, hi): segments whose
        [kmin, kmax] misses the range are CARRIED FORWARD by reference
        (manifest-stats pruning — never read); intersecting segments are
        rewritten without the deleted keys.  Returns
        (snapshot_id, segments_rewritten, segments_carried)."""
        prev_id = self.current_id()
        snap_id = prev_id + 1
        out, seq, rewritten, carried = [], 0, 0, 0
        for seg in self._load(prev_id):
            misses = (seg["kmax"] is None or seg["kmax"] < lo
                      or seg["kmin"] >= hi)
            if misses:
                out.append(seg)
                carried += 1
                continue
            kept = spark.read.parquet(seg["path"]).filter(
                ~((F.col(self.key_col) >= lo) & (F.col(self.key_col) < hi)))
            new_seg = self._write_segment(kept, snap_id, seq)
            seq += 1
            rewritten += 1
            if new_seg["rows"]:
                out.append(new_seg)
        self._commit(snap_id, out)
        return snap_id, rewritten, carried

    def read(self, spark: SparkSession,
             as_of: Optional[int] = None,
             merge_schema: bool = False) -> DataFrame:
        """Scan the table AS OF a snapshot (default: latest).  The plan is
        built from the manifest's live segment list only — time travel is
        pure metadata.  ``merge_schema=True`` reads across SCHEMA
        EVOLUTION (Iceberg add-column semantics): segments written before
        a column existed surface it as NULL — parquet's per-file schema
        union, no rewrite of old segments."""
        snap_id = self.current_id() if as_of is None else as_of
        segments = self._load(snap_id)
        if not segments:
            raise ValueError(f"snapshot {snap_id} is empty")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[s["path"] for s in segments])

    def merge_upsert(self, spark: SparkSession, source: DataFrame
                     ) -> tuple[int, int, int]:
        """Copy-on-write MERGE (Iceberg MERGE INTO semantics, upsert form):
        rows of ``source`` REPLACE same-key rows and INSERT new keys.

        Segment pruning is ONE pass: source keys range-join (broadcast)
        the manifest's (kmin, kmax) stats — a segment with no source key
        inside its range is carried forward by reference, never read.
        Hit segments are rewritten with matched keys anti-joined out;
        the whole source lands as one new segment (updates + inserts
        together).  Returns (snapshot_id, segments_rewritten,
        segments_carried)."""
        prev_id = self.current_id()
        snap_id = prev_id + 1
        segs = self._load(prev_id)
        ranges = [
            (i, s["kmin"], s["kmax"]) for i, s in enumerate(segs)
            if s["kmin"] is not None
        ]
        keys = source.select(F.col(self.key_col))
        hits: set = set()
        if ranges:
            rdf = spark.createDataFrame(
                ranges, "seg_idx int, kmin long, kmax long")
            k = F.col(self.key_col)
            hits = {
                r["seg_idx"]
                for r in keys.join(
                    F.broadcast(rdf),
                    (k >= F.col("kmin")) & (k <= F.col("kmax")),
                ).select("seg_idx").distinct().collect()
            }
        out, seq, rewritten, carried = [], 0, 0, 0
        for i, seg in enumerate(segs):
            if i not in hits:
                out.append(seg)
                carried += 1
                continue
            kept = spark.read.parquet(seg["path"]).join(
                F.broadcast(keys), self.key_col, "left_anti")
            new_seg = self._write_segment(kept, snap_id, seq)
            seq += 1
            rewritten += 1
            if new_seg["rows"]:
                out.append(new_seg)
        out.append(self._write_segment(source, snap_id, seq))
        self._commit(snap_id, out)
        return snap_id, rewritten, carried

    def merge_full(self, spark: SparkSession, source: DataFrame,
                   delete_col: str = "_delete"
                   ) -> tuple[int, int, int]:
        """Full MERGE surface (Iceberg MERGE INTO with all three clauses):
        source rows flagged ``delete_col`` DELETE their matched keys
        (WHEN MATCHED AND … THEN DELETE); unflagged rows UPDATE matched
        keys / INSERT new keys.  Same one-pass stats pruning as
        merge_upsert — every source key (delete or upsert) participates
        in the range probe; untouched segments are carried by reference.
        Returns (snapshot_id, segments_rewritten, segments_carried)."""
        prev_id = self.current_id()
        snap_id = prev_id + 1
        segs = self._load(prev_id)
        ranges = [
            (i, s["kmin"], s["kmax"]) for i, s in enumerate(segs)
            if s["kmin"] is not None
        ]
        keys = source.select(F.col(self.key_col))
        hits: set = set()
        if ranges:
            rdf = spark.createDataFrame(
                ranges, "seg_idx int, kmin long, kmax long")
            k = F.col(self.key_col)
            hits = {
                r["seg_idx"]
                for r in keys.join(
                    F.broadcast(rdf),
                    (k >= F.col("kmin")) & (k <= F.col("kmax")),
                ).select("seg_idx").distinct().collect()
            }
        upserts = source.filter(~F.col(delete_col)).drop(delete_col)
        out, seq, rewritten, carried = [], 0, 0, 0
        for i, seg in enumerate(segs):
            if i not in hits:
                out.append(seg)
                carried += 1
                continue
            # matched keys leave the segment whether deleted or updated;
            # updates re-enter via the new source segment below
            kept = spark.read.parquet(seg["path"]).join(
                F.broadcast(keys), self.key_col, "left_anti")
            new_seg = self._write_segment(kept, snap_id, seq)
            seq += 1
            rewritten += 1
            if new_seg["rows"]:
                out.append(new_seg)
        new_seg = self._write_segment(upserts, snap_id, seq)
        if new_seg["rows"]:
            out.append(new_seg)
        self._commit(snap_id, out)
        return snap_id, rewritten, carried

    def compact(self, spark: SparkSession,
                max_rows: int | None = None) -> tuple[int, int, int]:
        """Table maintenance: rewrite the small-segment tail into ONE
        segment (Iceberg rewrite_data_files / OPTIMIZE).  Segments with
        more than ``max_rows`` rows (default: none — compact everything)
        are carried by reference; the rest are read once, coalesced, and
        land as a single new segment.  Data is bit-identical before and
        after — only the manifest and file layout change.  Returns
        (snapshot_id, n_compacted, n_carried)."""
        prev_id = self.current_id()
        snap_id = prev_id + 1
        segs = self._load(prev_id)
        small = [s for s in segs
                 if max_rows is None or s["rows"] <= max_rows]
        big = [s for s in segs if s not in small]
        if len(small) <= 1:
            self._commit(snap_id, segs)
            return snap_id, 0, len(segs)
        merged = spark.read.parquet(*[s["path"] for s in small])
        out = big + [self._write_segment(merged, snap_id, 0)]
        self._commit(snap_id, out)
        return snap_id, len(small), len(big)
