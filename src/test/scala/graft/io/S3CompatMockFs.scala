package graft.io

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only Hadoop FileSystem registered under the `s3a` scheme
  * (`fs.s3a.impl` → this class) so the object-store I/O surface
  * (configureS3a + readAuto / writeAuto / listing / compact) can be
  * exercised END-TO-END through `s3a://`-style URIs in the zero-egress
  * environment (no object store to connect to, and no hadoop-aws jar on
  * the classpath at all — `ls /opt/spark/jars | grep aws` is empty).
  *
  * What this DOES verify: every LakeIO operator resolves paths through
  * Hadoop's FileSystem machinery (scheme lookup, qualification, status
  * listing, rename/delete semantics) rather than assuming `file://` or
  * touching `java.io.File` — i.e. the engine is object-store-agnostic
  * by construction. What it CANNOT verify: S3AFileSystem's own wire
  * behavior (multipart uploads, eventual-consistency handling,
  * credential providers) — that needs a real endpoint.
  *
  * Pattern: same as Spark's own test `FakeFileSystem` — delegate all
  * storage to the local filesystem but present a non-`file` URI, so
  * returned FileStatus paths come back qualified as `s3a:/...` and any
  * scheme-sensitive bug (e.g. stripping qualifiers, re-parsing with
  * `new java.io.File`) would surface as a failure.
  */
class S3CompatMockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3a:///")
  override def getScheme: String = "s3a"

  /** RawLocal's DeprecatedRawLocalFileStatus loads permissions LAZILY by
    * re-parsing its own (now s3a-qualified) path with `new java.io.File`
    * — which throws for a non-file scheme. Materialize plain FileStatus
    * objects with preloaded (default) permissions instead; getLen /
    * isDirectory / mtime are already loaded and permission bits are
    * meaningless for an object store anyway.
    */
  private def materialize(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      "graft", "graft", st.getPath)

  override def getFileStatus(p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus =
    materialize(super.getFileStatus(p))

  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(materialize)
}
