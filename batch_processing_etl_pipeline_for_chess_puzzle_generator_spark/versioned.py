"""Versioned snapshot tables: Delta-style time-travel reads on plain
parquet.

The reference tracks progress at file granularity (a processed-files
ledger, etl/transform.py:24-34); a warehouse user needs the TABLE-level
analog — "read this table as of version N" — after every CDC merge or
compaction rewrite. This module provides the minimal transaction-log
pattern the real lakehouse formats (Delta/Iceberg) build on:

- every write lands in an immutable data directory ``v_N/``,
- a version becomes VISIBLE only when its tiny manifest JSON appears in
  ``_manifest/`` (written tmp-then-rename, so a crash mid-commit leaves
  no partial version — readers simply never see it),
- readers resolve a version by listing manifests (or pinning an
  explicit N) and read only that version's directory.

Scale notes (100 TB): data directories are immutable, so concurrent
readers never race a writer — a reader that pinned version N keeps a
consistent snapshot while N+1 commits. The manifest dir holds one
O(100-byte) JSON per version (the Delta log shape); listing it is
metadata-only. Real formats refine this to file-level manifests so a
version can share unchanged files with its parent instead of rewriting
the table — the commit protocol (stage → atomic manifest publish) is
identical, which is what this module demonstrates. The write path is a
plain distributed ``df.write.parquet``; nothing here touches the
driver beyond manifest metadata.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifest"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST_DIR)


def versions(table_path: str) -> list[int]:
    """Committed versions, ascending. A version exists iff its manifest
    JSON does — staged/crashed writes are invisible."""
    mdir = _manifest_path(table_path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            out.append(int(f[: -len(".json")]))
    return sorted(out)


_HIGH_WATER = ".high_water"


def _high_water(table_path: str) -> int:
    """Largest version number EVER committed (−1 for a fresh table) —
    survives vacuum, unlike the live manifest list, so history stays
    append-only: a vacuumed number can never be silently re-committed
    with different data (that would corrupt time-travel ordering)."""
    avail = versions(table_path)
    live = avail[-1] if avail else -1
    p = os.path.join(_manifest_path(table_path), _HIGH_WATER)
    if os.path.exists(p):
        with open(p) as fh:
            # max(): a crash between manifest publish and the marker
            # update leaves the marker one behind the live manifests.
            return max(int(fh.read()), live)
    return live


def write_version(df: DataFrame, table_path: str,
                  version: int | None = None) -> int:
    """Commit ``df`` as the next (or an explicit) version of the table.

    Commit protocol: distributed write into ``_staged_N`` → atomic
    rename to ``v_N`` → manifest JSON written tmp-then-rename. Readers
    only discover the version at the final rename, so every
    intermediate failure leaves the table exactly as it was. Version
    numbers are append-only for the table's lifetime: committing a
    number at or below the high-water mark raises, even if vacuum has
    since dropped that version's manifest.
    """
    import shutil

    hw = _high_water(table_path)
    if version is None:
        version = hw + 1
    if version <= hw:
        raise ValueError(
            f"version {version} already committed (or vacuumed; high water "
            f"{hw}) at {table_path} — history is append-only"
        )
    os.makedirs(_manifest_path(table_path), exist_ok=True)
    staged = os.path.join(table_path, f"_staged_{version}")
    final = os.path.join(table_path, f"v_{version}")
    # Crash recovery: a previous writer may have died between the data
    # rename and the manifest publish, leaving an orphaned v_N with no
    # manifest. The version was never visible (manifest IS visibility),
    # so clearing the orphan is safe under the single-writer contract —
    # without this, os.rename below fails forever and the table wedges.
    if os.path.exists(final):
        shutil.rmtree(final)
    df.write.mode("overwrite").parquet(staged)
    os.rename(staged, final)
    manifest = {
        "version": version,
        "dir": f"v_{version}",
        "schema": df.schema.json(),
    }
    tmp = os.path.join(_manifest_path(table_path), f".{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(_manifest_path(table_path), f"{version}.json"))
    hw_tmp = os.path.join(_manifest_path(table_path), f"{_HIGH_WATER}.tmp")
    with open(hw_tmp, "w") as fh:
        fh.write(str(version))
    os.rename(hw_tmp, os.path.join(_manifest_path(table_path), _HIGH_WATER))
    return version


def vacuum(table_path: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` versions.

    Order matters for crash safety — the MANIFEST is deleted first, so
    a version disappears from the catalog atomically before its data
    dir goes; a crash mid-vacuum leaves either a fully visible version
    or an invisible one whose orphaned data dir the next vacuum
    sweeps. Readers that already resolved a manifest may race a
    concurrent vacuum (same as Delta/Iceberg: retention must exceed
    the longest reader pin — pick ``keep_last`` accordingly). The
    orphan sweep also clears ``_staged_*`` dirs, so vacuum must not
    run concurrently with an in-flight writer (single-writer
    maintenance window — the same contract the real formats put on
    VACUUM vs OPTIMIZE). Returns the versions removed.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    avail = versions(table_path)
    drop = avail[:-keep_last] if len(avail) > keep_last else []
    for v in drop:
        os.remove(os.path.join(_manifest_path(table_path), f"{v}.json"))
    for v in drop:
        shutil.rmtree(os.path.join(table_path, f"v_{v}"), ignore_errors=True)
    # sweep orphans from earlier crashes: data/staged dirs with no
    # manifest
    live = set(versions(table_path))
    for d in os.listdir(table_path):
        full = os.path.join(table_path, d)
        if not os.path.isdir(full) or d == _MANIFEST_DIR:
            continue
        if d.startswith("_staged_"):
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith("v_") and d[2:].isdigit() and int(d[2:]) not in live:
            shutil.rmtree(full, ignore_errors=True)
    return drop


def read_version(spark: SparkSession, table_path: str,
                 version: int | None = None) -> DataFrame:
    """Time-travel read: the table as of ``version`` (default: latest).

    Resolves the manifest, then reads ONLY that version's immutable
    directory — a later commit can't disturb this snapshot.
    """
    avail = versions(table_path)
    if not avail:
        raise FileNotFoundError(f"no committed versions at {table_path}")
    if version is None:
        version = avail[-1]
    if version not in avail:
        raise ValueError(f"version {version} not in {avail} at {table_path}")
    with open(os.path.join(_manifest_path(table_path), f"{version}.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(os.path.join(table_path, manifest["dir"]))
