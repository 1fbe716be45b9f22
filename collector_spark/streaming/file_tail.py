"""S31 — file-tail log source with rotation/offset markers.

Reference: the collector resumes log ingestion from persisted per-file
markers — ``PersistedLogState.ReadFileMarkers`` (byte offsets) and
``AwsMarkers`` (RDS pagination markers) in state/logs.go:27-44; the RDS
adapter's poll loop (input/system/rds/logs.go:66-120) downloads each file's
portion after the stored marker, then persists the new marker. Markers for
files that vanished are discarded.

Spark mapping: Structured Streaming's file source tracks *whole immutable
files*, so the tail adapter bridges the gap:

  poll() reads each ``*.log`` file from its marker to the last complete
  line, stages the new bytes as an IMMUTABLE chunk file named
  ``<file>.g<generation>-<start>-<end>`` in a staging directory, then
  atomically persists the markers (tmp + rename). A standard
  ``spark.readStream.text(staging_dir)`` consumes the chunks; Spark's own
  checkpoint dedups chunk files downstream.

Exactly-once across crashes, without coordination:
  - chunk names encode (generation, start, end); staging is write-tmp +
    rename, so a chunk is either fully present or absent;
  - recovery folds staged chunk end-offsets back into the markers
    (offset := max(marker, staged ends)), so a crash BETWEEN staging and
    marker persistence re-reads nothing and duplicates nothing;
  - rotation (file size < marker) bumps the file's generation and resets
    its offset to 0, so chunks of the rotated-in content can never collide
    with chunks of the old content;
  - a partial trailing line (no newline yet) stays unconsumed until the
    writer completes it, mirroring the reference's line-buffered tailing.

Scale: the tailer is per-host plumbing (one process per log directory, like
the collector itself); the Spark side is the standard file source, which
scales by staging directory partitioning — chunks are immutable parquet-
sized text files, and maxFilesPerTrigger (ST8) bounds per-tick intake.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

_CHUNK_RE = re.compile(r"^(?P<src>.+)\.g(?P<gen>\d+)-(?P<start>\d{20})-(?P<end>\d{20})$")


@dataclass
class FileTailSource:
    log_dir: str
    staging_dir: str
    marker_path: str
    # markers: file name -> {"offset": int, "gen": int}
    markers: dict[str, dict[str, int]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        os.makedirs(self.staging_dir, exist_ok=True)
        self._load_markers()
        self._recover_from_staging()

    # -- marker persistence (PersistedLogState analog) ----------------------

    def _load_markers(self) -> None:
        try:
            with open(self.marker_path) as f:
                self.markers = json.load(f)
        except FileNotFoundError:
            self.markers = {}

    def _save_markers(self) -> None:
        tmp = self.marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.markers, f)
        os.replace(tmp, self.marker_path)

    def _recover_from_staging(self) -> None:
        """Fold staged chunk end-offsets into the markers: chunks are the
        ground truth for what was staged, so a crash between staging and
        marker persistence never re-stages (no duplication)."""
        for name in os.listdir(self.staging_dir):
            m = _CHUNK_RE.match(name)
            if not m:
                continue
            src, gen, end = m.group("src"), int(m.group("gen")), int(m.group("end"))
            cur = self.markers.get(src)
            if cur is None or gen > cur["gen"] or (
                gen == cur["gen"] and end > cur["offset"]
            ):
                self.markers[src] = {"offset": end, "gen": gen}

    # -- the poll loop (input/system/rds/logs.go:66-120 analog) -------------

    def poll(self) -> list[str]:
        """Stage new complete lines of every ``*.log`` file; return the
        newly staged chunk paths. Markers for files that no longer exist are
        discarded (state/logs.go:30-32 comment)."""
        staged: list[str] = []
        present: set[str] = set()
        for name in sorted(os.listdir(self.log_dir)):
            if not name.endswith(".log"):
                continue
            present.add(name)
            path = os.path.join(self.log_dir, name)
            size = os.path.getsize(path)
            cur = self.markers.get(name, {"offset": 0, "gen": 0})
            offset, gen = cur["offset"], cur["gen"]
            if size < offset:
                # rotation/truncation: new content under the same name —
                # new generation, start over at byte 0
                gen, offset = gen + 1, 0
            with open(path, "rb") as f:
                f.seek(offset)
                data = f.read()
            # only consume through the last complete line
            cut = data.rfind(b"\n")
            if cut < 0:
                self.markers[name] = {"offset": offset, "gen": gen}
                continue
            data = data[: cut + 1]
            end = offset + len(data)
            chunk = os.path.join(
                self.staging_dir, f"{name}.g{gen}-{offset:020d}-{end:020d}"
            )
            if not os.path.exists(chunk):
                tmp = chunk + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, chunk)
                staged.append(chunk)
            self.markers[name] = {"offset": end, "gen": gen}
        # discard markers of vanished files
        self.markers = {k: v for k, v in self.markers.items() if k in present}
        self._save_markers()
        return staged


def staged_lines_stream(spark, staging_dir: str, max_files_per_trigger: int | None = None):
    """The Spark half: a standard streaming text source over the staged
    chunks (each row = one raw log line, ``value`` column)."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(staging_dir)
