"""Shared Hadoop-FileSystem helpers — ONE implementation of the
scheme-resolved FS access + atomic JSON-manifest protocol that the
storage-adjacent operators (continuous rollup high-water mark, IVF
index manifest, maintenance partition walks) all need. The FS is
always resolved from the PATH's own scheme, so file://, hdfs:// and
s3a:// behave identically; manifests commit via write-tmp-then-rename
(atomic on HDFS/POSIX, the closest available commit on object stores).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def hpath(spark: SparkSession, p: str):
    return spark._jvm.org.apache.hadoop.fs.Path(p)


def fs_for(spark: SparkSession, p: str):
    return hpath(spark, p).getFileSystem(spark._jsc.hadoopConfiguration())


def read_json_manifest(spark: SparkSession, path: str) -> dict | None:
    """The manifest's dict, or None when it does not exist."""
    fs = fs_for(spark, path)
    p = hpath(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def write_json_manifest(spark: SparkSession, path: str, payload: dict) -> None:
    """Manifest commit: write ``path + '.tmp'``, delete any previous
    manifest (Hadoop rename refuses to clobber), rename into place.
    A torn/partial manifest is never observable — but the
    delete→rename pair is NOT one atomic step: a crash (or a
    concurrent read) in between sees NO manifest. Callers must treat
    an absent manifest as 'cold start' (the rollup re-aggregates from
    base — correct, just slower; the IVF index reports not-built) and
    re-run the writer to converge; none may assume old-or-new
    atomicity."""
    fs = fs_for(spark, path)
    tmp = hpath(spark, path + ".tmp")
    dst = hpath(spark, path)
    out = fs.create(tmp, True)  # overwrite=True
    try:
        out.write(json.dumps(payload).encode("utf-8"))
    finally:
        out.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"manifest rename failed: {tmp} -> {dst}")
