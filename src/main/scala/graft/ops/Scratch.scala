package graft.ops

import org.apache.spark.sql.SparkSession

/** App-scoped scratch directories for the benchmark queries that keep a
  * STANDING artifact (ANN indexes, the BPE merge table): built once per
  * (application, dataset) and reused by repeat runs — the benchmark face
  * of "train/build once, serve forever". Collision discipline as the
  * q88 signature store: applicationId × dataset-md5 in the name, and a
  * shutdown hook deletes the tree on JVM exit. */
private[graft] object Scratch {
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dir(s: SparkSession, dataset: String, kind: String): String = {
    val dTag = java.security.MessageDigest.getInstance("MD5")
      .digest(dataset.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
      s"${s.sparkContext.applicationId}_$dTag"
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (hooked.add(path)) {
      sys.addShutdownHook { try fs.delete(hp, true) catch { case _: Exception => () } }
    }
    path
  }
}
