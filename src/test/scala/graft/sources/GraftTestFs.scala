package graft.sources

/** A NON-DEFAULT Hadoop FileSystem for the storage-seam spec: local
  * disk served under its own `graftfs://` scheme, registered via
  * `fs.graftfs.impl`. Reading blobs through it proves JsonBlobSource
  * touches storage only through the `FileSystem` resolver — the same
  * seam an `s3a://` bucket plugs into on a real cluster (the
  * reference's go-cloud `*blob.Bucket` portability, rblob/blob.go:69).
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}
