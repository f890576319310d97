"""Small-file IO through the Hadoop FileSystem API (JVM gateway).

Side-channel artifacts (lineage manifests, codebooks) must land on the
SAME filesystem as the data they describe — builtin ``open()`` silently
writes a local file when the output dir is ``hdfs://``/``s3a://``, which
breaks the "manifest row written only after the data commit" pairing.
These helpers resolve the scheme from the path, so local paths keep
working unchanged and remote URIs go through the cluster's filesystem.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-or-overwrite ``path`` with UTF-8 ``text`` (any Hadoop FS)."""
    fs, jpath, _ = _fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read all of ``path`` as UTF-8 bytes, depending only on Hadoop's own
    APIs (``org.apache.hadoop.io.IOUtils``) — NOT commons-io, which is an
    undeclared transitive dep a shaded/slimmed distro may drop. The copy
    happens entirely JVM-side into a ByteArrayOutputStream (a byte buffer
    passed from Python through py4j would not see JVM-side mutation);
    the returned byte[] converts to Python bytes by value."""
    fs, jpath, jvm = _fs(spark, path)
    stream = fs.open(jpath)
    out = jvm.java.io.ByteArrayOutputStream()
    # close=True closes both streams, even on error
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, True)
    return bytes(out.toByteArray()).decode("utf-8")


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """Delete ``path`` (no-op False if absent) on whatever FS owns it."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.exists(jpath))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, jpath, _ = _fs(spark, path)
    fs.mkdirs(jpath)


def list_names(spark: SparkSession, path: str) -> list[str]:
    """File/dir names directly under ``path`` ([] if it doesn't exist)."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))
