package graft.ml

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream,
  FileOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.ml.workflow.Transformer

/** Fitted-pipeline persistence (ref: the reference persists fitted
  * pipelines via Java serialization in its example workloads — model
  * save/load between a training job and a serving process).
  *
  * A fitted [[Transformer]] chain here closes over model-sized plain
  * Scala state only — weight/mean/axis arrays, vocab maps, MLlib model
  * wrappers (Params objects, themselves Serializable); literal Columns
  * are rebuilt inside each `apply`, and training frames are released by
  * the AutoCache/withCached fitting scopes before the fitted transformer
  * is returned. One Java-serialization round trip therefore persists the
  * whole chain, and the loaded chain serves both ways: distributed
  * `apply(df)` on a cluster, or per-datum `applyLocal` with zero jobs. */
object ModelIO {

  def save(t: Transformer, path: String): Unit = {
    val oos = new ObjectOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try oos.writeObject(t) finally oos.close()
  }

  def load(path: String): Transformer = {
    val ois = new ObjectInputStream(new BufferedInputStream(
      new FileInputStream(path)))
    try ois.readObject().asInstanceOf[Transformer] finally ois.close()
  }
}
