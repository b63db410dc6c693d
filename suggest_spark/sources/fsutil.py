"""Hadoop FileSystem helpers (py4j) — filesystem-scheme-agnostic file ops.

Every path the engine maintains (index warehouses, streaming registries,
manifests, funnels) can live on hdfs:// or s3a:// just as well as file:// —
so none of the maintenance code may use ``os`` / ``shutil``, which silently
no-op or misroute on remote schemes.  These helpers go through the JVM's
``org.apache.hadoop.fs.FileSystem`` resolved per-path, the same API Spark's
own committers use, and FAIL LOUDLY: a delete or create that does not happen
raises instead of leaving stale data behind.

The one atomicity primitive exposed is ``create_text_exclusive``: an
O_EXCL-style create that either publishes the whole file or raises —
atomic on HDFS and local filesystems, which is what a manifest-log commit
(operators/versioned.py) needs.  (S3A's create is not atomic; a real S3
deployment fronts the manifest log with a DynamoDB/Iceberg-style catalog —
documented there, not hidden here.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def delete(spark: SparkSession, path: str, recursive: bool = True) -> None:
    """Delete ``path`` if present; raise if the delete does not happen."""
    fs, hpath, _ = _fs(spark, path)
    if fs.exists(hpath) and not fs.delete(hpath, recursive):
        raise IOError(f"failed to delete {path}")


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names (files and dirs) under ``path``; [] if absent."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(hpath))


def mtime(spark: SparkSession, path: str) -> float:
    """Modification time of ``path`` in epoch seconds (0.0 if absent)."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return 0.0
    return fs.getFileStatus(hpath).getModificationTime() / 1000.0


def read_text(spark: SparkSession, path: str) -> str:
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-or-replace a small text file (non-atomic; use for audit
    artifacts like funnels, not for commit pointers)."""
    fs, hpath, _ = _fs(spark, path)
    fs.mkdirs(hpath.getParent())
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def create_text_exclusive(spark: SparkSession, path: str, text: str) -> None:
    """Atomically publish ``text`` at ``path``; raise if ``path`` exists.

    ``FileSystem.create(overwrite=False)`` is an exclusive create on HDFS
    and local filesystems — the commit primitive for a monotone manifest
    log (two concurrent committers of the same version: exactly one wins,
    the other raises instead of corrupting the log)."""
    fs, hpath, _ = _fs(spark, path)
    fs.mkdirs(hpath.getParent())
    stream = fs.create(hpath, False)  # overwrite=False → atomic exclusive
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
