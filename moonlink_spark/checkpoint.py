"""Job checkpoints: per-step lineage + metrics, idempotent resume.

Plays the role of moonlink's WAL + event replay (reference:
src/moonlink/src/storage/wal.rs:77-220 — persisted events, truncation up to
the Iceberg-persisted LSN, replay on recovery): every maintenance/MERGE job
records, per step, the source→output file lineage and metrics (rows, bytes,
skew ratio). A re-run of the same job (same job_id) reuses completed steps'
outputs instead of recomputing, and a job whose commit already landed
(table LSN >= job LSN) is a no-op — so the engine is resumable mid-job and
idempotent across retries, the north-rule requirement.

Layout: <checkpoint_root>/<job_id>/step-<name>.json
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from moonlink_spark.table.format import FileEntry
from moonlink_spark.table.io import accessor_for


@dataclass
class StepResult:
    name: str
    entries: list[FileEntry]
    metrics: dict
    sources: list[str]
    reused: bool = False


def skew_ratio(entries: list[FileEntry]) -> float:
    counts = [e.record_count for e in entries if e.record_count]
    if not counts:
        return 1.0
    return max(counts) / (sum(counts) / len(counts))


class JobCheckpoint:
    def __init__(self, root: str, job_id: str):
        self.dir = os.path.join(root, job_id)
        self._acc = accessor_for(self.dir)
        self._acc.mkdirs(self.dir)

    def _path(self, step: str) -> str:
        return os.path.join(self.dir, f"step-{step}.json")

    def load(self, step: str) -> StepResult | None:
        p = self._path(step)
        if not self._acc.exists(p):
            return None
        d = json.loads(self._acc.read_text(p))
        entries = [FileEntry.from_dict(e) for e in d["entries"]]
        # outputs must still exist — a torn write invalidates the step
        if not all(accessor_for(e.path).exists(e.path) for e in entries):
            return None
        return StepResult(
            name=step,
            entries=entries,
            metrics=d["metrics"],
            sources=d["sources"],
            reused=True,
        )

    def save(
        self,
        step: str,
        entries: list[FileEntry],
        metrics: dict | None = None,
        sources: list[str] | None = None,
    ) -> StepResult:
        metrics = dict(metrics or {})
        metrics.setdefault("files", len(entries))
        metrics.setdefault("rows", sum(e.record_count for e in entries))
        metrics.setdefault("bytes", sum(e.file_size_bytes for e in entries))
        metrics.setdefault("skew_ratio", skew_ratio(entries))
        self._acc.write_atomic(
            self._path(step),
            json.dumps(
                {
                    "entries": [e.to_dict() for e in entries],
                    "metrics": metrics,
                    "sources": sources or [],
                }
            ),
        )
        return StepResult(step, entries, metrics, sources or [], reused=False)

    def run(self, step: str, fn, sources: list[str] | None = None, metrics: dict | None = None) -> StepResult:
        """fn() -> list[FileEntry]; skipped when the step already completed."""
        got = self.load(step)
        if got is not None:
            return got
        entries = fn()
        return self.save(step, entries, metrics, sources)

    def all_metrics(self) -> dict:
        out = {}
        for p in self._acc.list(self.dir, suffix=".json"):
            fn = os.path.basename(p)
            if fn.startswith("step-"):
                out[fn[5:-5]] = json.loads(self._acc.read_text(p))["metrics"]
        return out
