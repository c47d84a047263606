"""Incremental batch processing: file ledger + extraction cursor.

Generalizes the reference's two hand-rolled mechanisms:

- ``processed_files.txt`` append-ledger (reference: etl/transform.py:24-34)
  → :class:`FileLedger`, same semantics (idempotent re-runs skip files
  already processed) with atomic writes. The Structured Streaming file
  source with a checkpoint (sources/ndjson.py::read_games_stream) is the
  preferred form at scale; the ledger remains for plain-batch callers.
- ``last_timestamp.txt`` cursor (reference: etl/extract.py:24-39)
  → :class:`Cursor`, a storage-agnostic high-watermark for cursor-based
  API extraction.

Both are tiny driver-side metadata files — the DATA path stays fully
distributed; only the bookkeeping is centralized, as it must be (the
set of processed files is global state).
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path


def _atomic_write(path: Path, content: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), prefix=path.name)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class FileLedger:
    """Tracks which input files a batch pipeline has already consumed."""

    def __init__(self, ledger_path: str | Path):
        self.path = Path(ledger_path)

    def processed(self) -> set[str]:
        try:
            return set(self.path.read_text().splitlines())
        except FileNotFoundError:
            return set()

    def new_files(self, directory: str | Path, suffix: str = ".ndjson") -> list[str]:
        done = self.processed()
        return sorted(
            str(p)
            for p in Path(directory).iterdir()
            if p.name.endswith(suffix) and p.name not in done
        )

    def mark(self, *filenames: str | Path) -> None:
        names = self.processed() | {Path(f).name for f in filenames}
        self.path.parent.mkdir(parents=True, exist_ok=True)
        _atomic_write(self.path, "\n".join(sorted(names)) + "\n")


class Cursor:
    """High-watermark cursor for incremental API extraction."""

    def __init__(self, cursor_path: str | Path):
        self.path = Path(cursor_path)

    def get(self) -> str | None:
        try:
            return self.path.read_text().strip() or None
        except FileNotFoundError:
            return None

    def set(self, value: str) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        _atomic_write(self.path, str(value))
