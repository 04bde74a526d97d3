package graft

/**
 * Cross-JVM persistence for standing stores (r18, VERDICT r17 #5).
 *
 * Every standing store — inverted-index segments, PQ bases, NB
 * language models, media feature stores, IVF quantizers — was keyed
 * by an in-memory TrieMap on [[Tables.corpusKey]]: correct within a
 * JVM, but the artifacts die with it, so every fresh session refits.
 * The catalog adds the missing durable layer: each store lands under
 * a stable root at `<root>/<corpusKey-slug>/<kind>` with a completion
 * marker written AFTER the build, and every TrieMap miss consults the
 * catalog before refitting — a SECOND JVM on the same corpus serves
 * warm (WarmStoreSpec proves it by dropping the in-memory layer).
 *
 * Persistence is OPT-IN via `GRAFT_STORE_DIR`: the round driver's
 * Verify/Bench runs deliberately measure the cold build + warm serve
 * split inside one JVM, so the default stays JVM-local scratch. A
 * fleet deployment sets `GRAFT_STORE_DIR` to shared storage — at
 * 100 TB the root is an object-store prefix and this catalog is the
 * table-service manifest in front of it.
 *
 * Staleness safety: the key embeds [[Tables.corpusKey]] (file names,
 * lengths, mtimes — a regenerated corpus misses), and each `kind`
 * carries a layout version (e.g. `inv_index@v2`) bumped whenever the
 * on-disk format changes, so an old JVM's artifact can never serve a
 * new layout.
 */
object StoreCatalog {

  private val inMemPaths =
    scala.collection.concurrent.TrieMap[(String, String), String]()
  private val inMemModels =
    scala.collection.concurrent.TrieMap[(String, String), AnyRef]()

  /** Test hook: env vars are immutable inside a JVM, so WarmStoreSpec
    * points the catalog at a scratch root through this. */
  private[graft] var rootOverride: Option[String] = None

  /** Durable root, when persistence is on. */
  def root: Option[String] =
    rootOverride.orElse(sys.env.get("GRAFT_STORE_DIR").filter(_.nonEmpty))

  private def slug(key: String): String =
    key.replaceAll("[^A-Za-z0-9._@-]", "_")

  private def durable(kind: String, key: String): Option[java.io.File] =
    root.map(r => new java.io.File(s"$r/${slug(key)}/${slug(kind)}"))

  private def marker(dir: java.io.File) =
    new java.io.File(dir, "_GRAFT_DONE")

  private def freshDir(dir: java.io.File): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
    dir.mkdirs(); ()
  }

  /**
   * Directory-shaped store: `build` writes the artifact INTO the
   * directory it is given; the returned path is that directory.
   * Warm order: in-memory hit → durable-catalog hit (marker present)
   * → build (into the durable dir when persistence is on, a scratch
   * dir otherwise).
   */
  def pathStore(kind: String, key: String)(build: String => Unit)
      : String =
    inMemPaths.getOrElseUpdate((kind, key), {
      durable(kind, key) match {
        case Some(dir) =>
          if (!marker(dir).exists()) {
            freshDir(dir)
            build(dir.toString)
            java.nio.file.Files.write(marker(dir).toPath, Array[Byte]())
          }
          dir.toString
        case None =>
          val dir = graft.sources.OrcIo.scratchDir(slug(kind))
          build(dir)
          dir
      }
    })

  /**
   * Driver-side model store (centroid matrices, PQ codebooks, …):
   * java-serialized next to the corpus's other artifacts. `fit` runs
   * at most once per (kind, corpus) across JVMs when persistence is
   * on.
   */
  def modelStore[T <: AnyRef with Serializable](kind: String,
      key: String)(fit: => T): T =
    inMemModels.getOrElseUpdate((kind, key), {
      durable(kind, key) match {
        case Some(dir) =>
          val f = new java.io.File(dir, "model.bin")
          if (marker(dir).exists() && f.exists()) {
            val in = new java.io.ObjectInputStream(
              new java.io.BufferedInputStream(
                new java.io.FileInputStream(f)))
            try in.readObject().asInstanceOf[T] finally in.close()
          } else {
            val m = fit
            freshDir(dir)
            val out = new java.io.ObjectOutputStream(
              new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(f)))
            try out.writeObject(m) finally out.close()
            java.nio.file.Files.write(marker(dir).toPath, Array[Byte]())
            m
          }
        case None => fit
      }
    }).asInstanceOf[T]

  /** Java-serialize a driver-side model into a path-store dir (for
    * stores that pair a model with on-disk data, e.g. PQ base). */
  def writeModel(path: String, m: AnyRef): Unit = {
    val out = new java.io.ObjectOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path)))
    try out.writeObject(m) finally out.close()
  }

  /** Twin of [[writeModel]]. */
  def readModel[T](path: String): T = {
    val in = new java.io.ObjectInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
    try in.readObject().asInstanceOf[T] finally in.close()
  }

  /** Test hook: forget the in-memory layer (simulates a fresh JVM —
    * durable artifacts survive and must satisfy the next lookup). */
  def dropInMemory(): Unit = {
    inMemPaths.clear()
    inMemModels.clear()
  }
}
