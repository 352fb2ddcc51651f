"""Generation-committed datasets: crash-safe state restatement.

The incremental/streaming stores in this engine (CDC current-state,
signature stores, restated partitioned tables) periodically REWRITE
state they were derived from. A plain ``mode("overwrite")`` of the path
being read is the classic self-clobber, and even with a
``localCheckpoint`` materialization first, a crash BETWEEN the delete
and the write of the overwrite torches the only copy.

This module generalizes ``compact_dataset``'s write-then-swap
(operators/layout.py) into a tiny multi-version commit protocol — the
same shape Delta/Iceberg snapshots use, reduced to what plain parquet
directories can express (no table format ships in this container):

```
store/
  gen-000001/  ... parquet + _SUCCESS + _COMMITTED
  gen-000002/  ... parquet + _SUCCESS + _COMMITTED   <- current
  gen-000003/  ... parquet (no _COMMITTED)           <- crashed write
```

* A generation is VISIBLE only once its ``_COMMITTED`` marker exists;
  the marker is written strictly after the data (and after Spark's own
  ``_SUCCESS``), so readers can never observe a half-written state.
* Readers resolve ``latest_generation`` = highest-numbered committed
  directory. A crash mid-write leaves an uncommitted directory that
  readers skip and the next successful commit garbage-collects.
* Writers never touch a committed generation: restatement = read gen N,
  write gen N+1, mark, GC. Reading and writing different directories
  also removes the need for ``localCheckpoint`` materialization
  entirely (and its extra copy of the state).
* ``link_partitions`` reuses UNCHANGED partition directories of the
  prior generation via hard links (fallback: copy) — the manifest-reuse
  trick of real table formats: restating one partition of an N-partition
  table costs one partition of IO plus O(files) metadata ops, never a
  full rewrite.

All filesystem operations go through Hadoop's ``FileSystem`` API (via
the session's JVM gateway), so the protocol is storage-agnostic
(local/HDFS; on S3 a real deployment would back the marker with a
conditional put or a catalog, which is exactly what table formats do).
Hard links are a local-FS fast path with a streamed copy fallback.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_GEN_RE = re.compile(r"^gen-(\d{6})$")
COMMIT_MARKER = "_COMMITTED"


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def _qualified(spark: SparkSession, path: str) -> str:
    """Fully-qualified FS URI for ``path`` (e.g. ``file:/tmp/...``) —
    every path this module RETURNS is qualified, so callers can compare
    them with each other regardless of how the store was spelled."""
    fs = _fs(spark, path)
    return str(fs.makeQualified(_jpath(spark, path)))


def _local(path: str) -> str:
    """Local-FS form of a (possibly ``file:``-scheme) path, for the
    hard-link fast path."""
    return path[5:] if path.startswith("file:") else path


def list_generations(spark: SparkSession, store: str) -> list[tuple[int, str, bool]]:
    """All generation dirs under ``store`` as (number, path, committed),
    ascending by number. Non-generation entries are ignored."""
    fs = _fs(spark, store)
    root = _jpath(spark, store)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        m = _GEN_RE.match(name)
        if not m:
            continue
        committed = fs.exists(
            _jpath(spark, str(st.getPath()) + "/" + COMMIT_MARKER)
        )
        out.append((int(m.group(1)), str(st.getPath()), committed))
    out.sort()
    return out


def latest_generation(spark: SparkSession, store: str) -> Optional[str]:
    """Path of the highest-numbered COMMITTED generation, or None."""
    committed = [p for _, p, ok in list_generations(spark, store) if ok]
    return committed[-1] if committed else None


def _gen_path(spark: SparkSession, store: str, n: int) -> str:
    return _qualified(spark, store.rstrip("/") + f"/gen-{n:06d}")


def mark_committed(spark: SparkSession, gen_path: str) -> None:
    """Write the commit marker — the LAST step of any generation write."""
    fs = _fs(spark, gen_path)
    fs.create(_jpath(spark, gen_path + "/" + COMMIT_MARKER), True).close()


def gc_generations(spark: SparkSession, store: str, keep: int = 2) -> None:
    """Drop uncommitted (crashed) generations below the current one and
    committed generations beyond the newest ``keep``."""
    gens = list_generations(spark, store)
    committed = [g for g in gens if g[2]]
    if not committed:
        return
    newest = committed[-1][0]
    keep_nums = {n for n, _, ok in committed[-keep:]}
    fs = _fs(spark, store)
    for n, path, ok in gens:
        stale_crash = (not ok) and n < newest
        evicted = ok and n not in keep_nums
        if stale_crash or evicted:
            fs.delete(_jpath(spark, path), True)


def commit_generation(
    df: DataFrame, store: str, keep: int = 2
) -> str:
    """Write ``df`` as the next generation of ``store`` and commit it.

    Crash-safety: the parquet write and Spark's ``_SUCCESS`` land in a
    fresh ``gen-NNNNNN`` directory invisible to readers; only then is
    ``_COMMITTED`` created. A crash at ANY earlier point leaves the
    previous generation untouched and current. Returns the new path.
    """
    spark = df.sparkSession
    gens = list_generations(spark, store)
    n = (gens[-1][0] + 1) if gens else 1
    path = _gen_path(spark, store, n)
    df.write.mode("overwrite").parquet(path)
    fs = _fs(spark, path)
    if not fs.exists(_jpath(spark, path + "/_SUCCESS")):  # pragma: no cover
        raise IOError(f"generation write incomplete at {path}")
    mark_committed(spark, path)
    gc_generations(spark, store, keep=keep)
    return path


def next_generation_dir(spark: SparkSession, store: str) -> str:
    """Reserve the next generation path WITHOUT committing it — for
    writers that assemble a generation in several steps (e.g. link
    unchanged partitions, then overwrite one). Caller must finish with
    :func:`mark_committed` (+ optionally :func:`gc_generations`)."""
    gens = list_generations(spark, store)
    n = (gens[-1][0] + 1) if gens else 1
    return _gen_path(spark, store, n)


def link_partitions(
    src_gen: str, dst_gen: str, skip_partitions: set[str]
) -> None:
    """Populate ``dst_gen`` with the partition directories of
    ``src_gen``, hard-linking data files (copy fallback), EXCEPT the
    partition directory names in ``skip_partitions`` — those will be
    written fresh by the caller. The local-FS rendition of
    manifest reuse: unchanged partitions cost O(files) metadata ops.
    """
    import shutil

    src_gen, dst_gen = _local(src_gen), _local(dst_gen)
    for entry in os.listdir(src_gen):
        sp = os.path.join(src_gen, entry)
        if not os.path.isdir(sp) or entry in skip_partitions:
            continue
        dp = os.path.join(dst_gen, entry)
        os.makedirs(dp, exist_ok=True)
        for f in os.listdir(sp):
            sf, df_ = os.path.join(sp, f), os.path.join(dp, f)
            try:
                os.link(sf, df_)
            except OSError:  # cross-device / FS without hard links
                shutil.copy2(sf, df_)
