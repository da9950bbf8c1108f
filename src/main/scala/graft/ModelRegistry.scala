package graft

import org.apache.spark.sql.SparkSession

/** Persisted trained-model registry (VERDICT r13 missing-1 / next-1).
  *
  * The 320× ladder's warm decomposition proved that every model-door wall
  * is dominated by per-JVM retraining: s27 read 59.9 s wall for a 4.8 s
  * search (~55 s of IVF+PQ training), p32 50.2 s wall for a 2.9 s scoring
  * pass (DSIR training ~95 % of the row). [[Memo]]'s snapshot-keyed LRUs
  * already amortize that inside one JVM, but they die with the process —
  * on a real cluster that is every executor restart and every new session,
  * so a 100 TB pipeline would retrain per restart. This registry persists
  * the trained artifacts — IVF centroids, PQ codebooks, DSIR bucket models
  * and selection cutoffs, all small integer tables — to plain files keyed
  * on the SAME corpus file-snapshot key the in-JVM memos use, load-else-
  * train. Training is deterministic (fixed seeds, integer arithmetic), so
  * a registry hit is byte-equivalent to a retrain; the parity spec pins
  * that (`ModelRegistrySpec`: load==train hash-equal s04/s21/p32 output).
  *
  * Reference analog: cross-job work reuse is the reference's entire thesis
  * (sparksql-server/src/main/scala/rewriter/rules/scan/Caching.scala:85-108
  * detects a repeated scan and splices the cached copy in); persisting a
  * trained model across sessions is the same idea one level up — the
  * "scan" being reused is the training pass.
  *
  * Opt-in: set spark conf `spark.graft.modelRegistry.dir` (runtime-settable)
  * or env `SPARK_GRAFT_MODEL_REGISTRY` to a directory. Default OFF so every
  * shipped bench/ladder artifact keeps its process-cold semantics unless a
  * run states otherwise (the artifact-comparability discipline). In a real
  * deployment the directory would live on the shared filesystem next to
  * the corpus — the models are KBs, the writes are atomic renames, and
  * concurrent trainers racing the same key converge on identical bytes.
  *
  * Format: one flat text file per (kind, key) — header line, the raw key
  * (verified on load, so a filename-hash collision degrades to a retrain,
  * never a wrong model), then the 3-level long tensor with explicit
  * dimension lines. No java serialization (version-fragile), no Spark job
  * at load time (the whole point is skipping jobs).
  */
object ModelRegistry {

  private val loadCounter = new java.util.concurrent.atomic.LongAdder
  private val storeCounter = new java.util.concurrent.atomic.LongAdder
  /** Models served from disk this JVM (specs and artifacts read these to
    * prove the load path FIRED, not merely that the dir was set). */
  def loads: Long = loadCounter.sum()
  /** Models trained and written to the registry this JVM. */
  def stores: Long = storeCounter.sum()

  /** The registry directory, if configured: session conf first (runtime-
    * settable, so a gateway client can point a session at a registry with
    * SET), env fallback (so ladder child JVMs inherit one without plumbing
    * conf through every main). None ⇒ registry off, caller just trains. */
  def dir(spark: SparkSession): Option[java.nio.file.Path] =
    spark.conf.getOption("spark.graft.modelRegistry.dir")
      .orElse(sys.env.get("SPARK_GRAFT_MODEL_REGISTRY"))
      .filter(_.nonEmpty)
      .map(java.nio.file.Paths.get(_))

  /** Load-else-train a 3-level long tensor (the shape every graft model
    * flattens to: PQ codebooks natively; centroid sets / llr arrays /
    * cutoff pairs through the arity wrappers below). Registry off ⇒ plain
    * `train`. Corrupt or mismatched files retrain and overwrite. */
  def loadOrTrain(spark: SparkSession, kind: String, key: String)(
      train: => Array[Array[Array[Long]]]): Array[Array[Array[Long]]] =
    dir(spark) match {
      case None => train
      case Some(d) =>
        val file = d.resolve(fileName(kind, key))
        load(file, kind, key) match {
          case Some(model) => loadCounter.increment(); model
          case None =>
            val model = train
            store(d, file, kind, key, model)
            model
        }
    }

  /** 2-level wrapper (IVF centroids: k×dim longs). */
  def loadOrTrain2(spark: SparkSession, kind: String, key: String)(
      train: => Array[Array[Long]]): Array[Array[Long]] =
    loadOrTrain(spark, kind, key)(Array(train)).head

  /** 1-level wrapper (DSIR per-bucket llr). */
  def loadOrTrain1(spark: SparkSession, kind: String, key: String)(
      train: => Array[Long]): Array[Long] =
    loadOrTrain(spark, kind, key)(Array(Array(train))).head.head

  /** Pair wrapper (DSIR selection cutoff: cut + tie-break id). */
  def loadOrTrainPair(spark: SparkSession, kind: String, key: String)(
      train: => (Long, Long)): (Long, Long) = {
    val a = loadOrTrain1(spark, kind, key) { val (c, t) = train; Array(c, t) }
    (a(0), a(1))
  }

  /** Registry keys carry corpus paths and base64 — hash them into a safe
    * filename; the raw key inside the file is what authenticates. */
  private def fileName(kind: String, key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    kind + "-" + md.digest().map("%02x".format(_)).mkString + ".model"
  }

  private val Header = "graftmodel v1"

  private def load(file: java.nio.file.Path, kind: String,
      key: String): Option[Array[Array[Array[Long]]]] =
    try {
      if (!java.nio.file.Files.isRegularFile(file)) None
      else {
        val lines = java.nio.file.Files.readAllLines(
          file, java.nio.charset.StandardCharsets.UTF_8)
        val it = lines.iterator()
        if (it.next() != s"$Header $kind" || it.next() != key) None
        else Some(Array.fill(it.next().trim.toInt) {
          Array.fill(it.next().trim.toInt) {
            it.next().trim.split(' ').map(_.toLong)
          }
        })
      }
    } catch { case _: Exception => None } // corrupt/truncated ⇒ retrain

  private def store(d: java.nio.file.Path, file: java.nio.file.Path,
      kind: String, key: String, model: Array[Array[Array[Long]]]): Unit =
    try {
      java.nio.file.Files.createDirectories(d)
      val sb = new StringBuilder
      sb.append(Header).append(' ').append(kind).append('\n')
      sb.append(key).append('\n')
      sb.append(model.length).append('\n')
      model.foreach { outer =>
        sb.append(outer.length).append('\n')
        outer.foreach(inner => sb.append(inner.mkString(" ")).append('\n'))
      }
      // atomic publish: concurrent trainers of the same key write identical
      // bytes (deterministic training), so last-rename-wins is safe and a
      // reader can never observe a half-written file
      val tmp = d.resolve(file.getFileName.toString + ".tmp-" +
        java.util.UUID.randomUUID().toString)
      java.nio.file.Files.write(tmp,
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try java.nio.file.Files.move(tmp, file,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, file,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      storeCounter.increment()
    } catch {
      // registry failures must never fail the query — the trained model in
      // hand is correct; persistence is an amortization, not a contract
      case e: Exception =>
        System.err.println(s"[model-registry] store $kind failed: $e")
    }
}
