"""Driver-side Hadoop FileSystem access, shared by every component
that does manifest/store/maintenance metadata work (manifest sink,
streaming stores, snapshot maintenance).

One accessor instead of per-module copies: resolving the FileSystem
FROM the path (not ``FileSystem.get``) is what makes the same code work
across ``file://``, ``hdfs://`` and ``s3a://`` — a fix to how the
configuration or scheme is resolved must land everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, jvm) for ``path``'s scheme, using the session's
    Hadoop configuration."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm
