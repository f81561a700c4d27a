package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, over the
  * `documents` table.
  *
  * Design split: signature KERNELS (minhash/simhash/gram hashing) run in
  * typed JVM maps — Catalyst higher-order functions never enter
  * whole-stage codegen, and interpreted per-shingle expression trees are
  * ~100× slower than a tight JVM loop; the JOINS and AGGREGATIONS stay
  * relational (band equi-joins, hash aggregates) so Catalyst/AQE own the
  * distribution, skew handling and pushdown.
  *
  * Scale notes (100 TB): exact dedup is one hash-aggregate on md5(text)
  * (map-side partial aggregation collapses duplicates before the
  * exchange). Banding turns all-pairs similarity into equi-joins on band
  * keys — candidate pairs only, never n². Degenerate hot buckets
  * (boilerplate signatures shared by a large corpus fraction) are dropped
  * by a size cap before the self-join: at scale that is the difference
  * between a join and an outage.
  */
object Dedup {

  /** Exact duplicate groups: hash-groupBy on content digest. */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    TableIO(spark, sfDir).read("documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
  }

  // All signature kernels hash in GF(2^61-1) via Hash61 (round 2): same
  // banding/join shapes as round 1, but every kernel is now bit-exactly
  // reproducible in DuckDB HUGEINT — minhash/simhash/jaccard gained full
  // SQL oracles (SparkEntry.oracleSql), which 64-bit wrapping mixers
  // could not support.

  private[spark] def wordHashes(text: String): Array[Long] = {
    val words = text.split("\\s+")
    val out = new Array[Long](words.length)
    var n = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) { out(n) = Hash61.wordHash(w); n += 1 }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Word-3-shingle hashes (order-sensitive, field-valued). */
  private[spark] def shingleHashes(text: String): Array[Long] = {
    val wh = wordHashes(text)
    if (wh.length < 3) return Array.empty
    val out = new Array[Long](wh.length - 2)
    var i = 0
    while (i + 2 < wh.length) {
      out(i) = Hash61.shingle3(wh(i), wh(i + 1), wh(i + 2))
      i += 1
    }
    out
  }

  private[spark] val MaxBucket = 64

  /** MinHash signature + per-band hashes for one document — the kernel
    * shared by the batch band join ([[minhashLsh]]) and the streaming
    * detector ([[StreamingNearDup]]), so the two faces are pair-for-pair
    * comparable. Returns None for documents too short to shingle. */
  private[spark] def bandedSignature(text: String, numHashes: Int = 16,
      bands: Int = 4): Option[(Array[Long], Array[Long])] = {
    val rowsPerBand = numHashes / bands
    val sh = shingleHashes(text)
    if (sh.isEmpty) None
    else {
      val sig = new Array[Long](numHashes)
      var s = 0
      while (s < numHashes) {
        val seed = Hash61.mix(s + 1L) // deterministic per-hash seed
        var m = Long.MaxValue
        var i = 0
        while (i < sh.length) {
          val h = Hash61.mix(sh(i) ^ seed)
          if (h < m) m = h
          i += 1
        }
        sig(s) = m
        s += 1
      }
      val bhs = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var bh = 0L
        var r = 0
        while (r < rowsPerBand) { bh = Hash61.mix(bh ^ sig(b * rowsPerBand + r)); r += 1 }
        bhs(b) = bh
        b += 1
      }
      Some((sig, bhs))
    }
  }

  /** MinHash signatures + LSH banding: word-3-shingles → k minhashes →
    * bands → band equi-join → candidate pairs with matching-minhash
    * count. */
  def minhashLsh(spark: SparkSession, sfDir: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    import spark.implicits._
    VectorFunctions.register(spark)
    // kernel: per doc, signature and band hashes in one pass (the scan
    // rebalanced so the kernel runs at full parallelism — guide §2.5)
    val banded0 = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .flatMap { case (id, text) =>
        bandedSignature(text, numHashes, bands).iterator.flatMap {
          case (sig, bhs) =>
            (0 until bands).iterator.map(b => (id, sig, b, bhs(b)))
        }
      }.toDF("doc_id", "sig", "band_idx", "band_hash")

    // hot-bucket cap as a WINDOW count over the band exchange instead of
    // a separate aggregate joined back: the previous agg+join shape ran
    // the signature kernel once per plan reference (4 MapPartitions
    // passes in explain — the a/b self-join sides plus the bucketSizes
    // subtree each re-scanned and re-shingled the corpus); the window
    // rides the ONE hash(band_idx, band_hash) exchange, which the
    // self-join below then reuses for both sides (guide §1.2 "don't
    // repeat passes", §2.4 "share one exchange"). Same rows kept: the
    // per-bucket count is the same number the aggregate produced.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    val banded = banded0.withColumn("bsz", count(lit(1)).over(wBucket))
      .where(col("bsz") <= MaxBucket).drop("bsz")

    val a = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        // codegen'd positional match count (SigMatchCount) — the HOF
        // version of this (aggregate over zip_with) is interpreted and
        // was round 2's one remaining hot-path anti-pattern
        call_function("sig_match_count", col("sig_a"), col("sig_b")).as("matching"))
      .distinct()
  }

  /** Incremental near-dup detection — the recurring-crawl shape: a new
    * batch (here the deterministic slice `Hash61.mix(doc_id) % newMod
    * == 0`, standing in for "this week's crawl") is deduplicated against
    * the existing index AND against itself, but old-old pairs are never
    * recomputed. At 100 TB that asymmetry is the whole operator: the
    * index side's banded signatures are write-once (the real persisted
    * flow is [[writeSignatureIndex]] + [[probeIndex]] — a standing
    * signature table appended once per crawl, lifecycle-proven in
    * DedupClusterSpec), so each increment costs O(new · bands) join
    * probes instead of a full-corpus re-banding.
    * The band equi-join keeps the full corpus on the left
    * and ONLY the new slice on the right, so the shuffled side is the
    * small one; the hot-bucket cap is computed over the union (same
    * contract as [[minhashLsh]], so incremental ∪ old-old == batch —
    * pinned in DedupClusterSpec).
    *
    * Emits the [[minhashLsh]] pair schema (doc_a < doc_b, matching)
    * restricted to pairs touching at least one new document. */
  def incremental(spark: SparkSession, sfDir: String,
      numHashes: Int = 16, bands: Int = 4, newMod: Int = 5): DataFrame = {
    import spark.implicits._
    val banded0 = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .flatMap { case (id, text) =>
        val isNew = Hash61.mix(id) % newMod == 0
        bandedSignature(text, numHashes, bands).iterator.flatMap {
          case (sig, bhs) =>
            (0 until bands).iterator.map(b => (id, isNew, sig, b, bhs(b)))
        }
      }.toDF("doc_id", "is_new", "sig", "band_idx", "band_hash")
    // the tagged frame goes to the probe core DIRECTLY: splitting it into
    // index/fresh inputs and re-unioning inside probeIndex would run the
    // banding kernel once per branch
    probeTagged(banded0)
  }

  /** Banding kernel shared by the one-shot and PERSISTED-INDEX flows:
    * one row per (doc, band) carrying the full signature — the row
    * layout of the standing signature table ([[writeSignatureIndex]]). */
  def bandedFrame(docs: Dataset[(Long, String)],
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    TableIO.rebalanceSmall(docs).flatMap { case (id, text) =>
      bandedSignature(text, numHashes, bands).iterator.flatMap {
        case (sig, bhs) =>
          (0 until bands).iterator.map(b => (id, sig, b, bhs(b)))
      }
    }.toDF("doc_id", "sig", "band_idx", "band_hash")
  }

  /** Write (or append) a slice's banded signatures as the standing
    * index — each document is banded exactly ONCE in its lifetime; every
    * later increment probes the stored rows. */
  def writeSignatureIndex(docs: Dataset[(Long, String)], io: TableIO,
      table: String, mode: SaveMode = SaveMode.Append,
      numHashes: Int = 16, bands: Int = 4): Unit =
    io.write(bandedFrame(docs, numHashes, bands), table, mode)

  /** Probe phase of the recurring-crawl flow: near-dup pairs between the
    * fresh slice and (standing index ∪ fresh). The old corpus is NOT an
    * input — the asymmetry [[incremental]]'s scaladoc describes is
    * structural here, not an optimization flag: old text is never
    * re-read, never re-shingled, never re-banded. The hot-bucket cap is
    * evaluated over (index ∪ fresh) AS OF THIS INCREMENT; a bucket that
    * only later crosses the cap keeps its earlier-emitted pairs — the
    * same emit-then-cap divergence from one-shot batch semantics the
    * streaming detector documents (StreamingNearDup), and
    * DedupClusterSpec pins its exact extent (lifecycle ⊇ batch, extras
    * confined to late-hot buckets).
    *
    * Emits the [[minhashLsh]] pair schema (doc_a < doc_b, matching). */
  def probeIndex(index: DataFrame, fresh: DataFrame): DataFrame =
    probeTagged(index.withColumn("is_new", lit(false))
      .unionByName(fresh.withColumn("is_new", lit(true))))

  /** Core of [[probeIndex]] over ONE tagged frame (doc_id, is_new, sig,
    * band_idx, band_hash): the hot-bucket cap is a window count over the
    * single band exchange and the fresh side is a filter of the SAME
    * capped subtree, so the band join's two sides reuse one exchange and
    * the banding kernel feeding it runs once — the previous
    * union + aggregate + two joins shape re-banded the inputs once per
    * plan reference (guide §1.2/§2.4). Same pairs: the cap counts
    * index ∪ fresh per bucket exactly as the aggregate did. */
  private[spark] def probeTagged(all: DataFrame): DataFrame = {
    val spark = all.sparkSession
    VectorFunctions.register(spark)
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    val capped = all.withColumn("bsz", count(lit(1)).over(wBucket))
      .where(col("bsz") <= MaxBucket)
    val left = capped
      .select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_l"), col("sig").as("sig_l"))
    val right = capped.where(col("is_new"))
      .select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_r"), col("sig").as("sig_r"))
    left.join(right, Seq("band_idx", "band_hash"))
      .where(col("id_l") =!= col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("doc_a"),
        greatest(col("id_l"), col("id_r")).as("doc_b"),
        // symmetric in (sig_l, sig_r), so the least/greatest reorder is safe
        call_function("sig_match_count", col("sig_l"), col("sig_r")).as("matching"))
      .distinct() // fresh-fresh pairs arrive in both orientations
  }

  /** Near-dup clustering: connected components over the MinHash-LSH pair
    * graph. Every document's cluster_id is the smallest doc_id reachable
    * through dup pairs (unpaired docs are their own cluster).
    * Deterministic: the min-label fixpoint is unique regardless of
    * execution order, so the DuckDB oracle's recursive transitive closure
    * lands on the same ids. The loop itself is [[ccLabels]] — see there
    * for the round bound and checkpoint story. */
  def clusters(spark: SparkSession, sfDir: String, maxIters: Int = 64,
      checkpointDir: Option[String] = None): DataFrame = {
    val labels = pairedClusterLabels(spark, sfDir, maxIters, checkpointDir)
    // unpaired documents are singletons (their own cluster) and never
    // needed the iterative loop — attach the vertex labels back with one
    // left join (auto-broadcast while the paired set is small; SMJ at
    // scale; either way far cheaper than iterating the full corpus)
    TableIO(spark, sfDir).read("documents")
      .select(col("doc_id"))
      .join(labels, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  /** Connected-component labels for the PAIRED documents only — the
    * vertices of the minhash pair graph. Documents outside every pair
    * cannot change label (no neighbor ever hooks them), so iterating the
    * full corpus through [[ccLabels]] was pure overhead: each round's
    * hooking/doubling joins and checkpoints carried corpus-sized frames
    * where only the (typically tiny) near-dup vertex set can move
    * (guide §1.2 "don't compute things you throw away"). At 100 TB the
    * vertex set is the near-dup population — the loop now scales with
    * THAT, not with the corpus. */
  def pairedClusterLabels(spark: SparkSession, sfDir: String,
      maxIters: Int = 64, checkpointDir: Option[String] = None): DataFrame = {
    // persist: the edge frame derives from the banded-signature pair
    // join — without the cache the signature kernel and band join would
    // run once per materialization. The vertex set is NOT materialized
    // separately: every pair endpoint appears as an edge src, so
    // ccLabels' round-1 hooking aggregate IS the vertex set (passing
    // ids = None skips the distinct exchange and round 1's left join).
    val pairs = minhashLsh(spark, sfDir).select("doc_a", "doc_b").persist()
    try ccLabels(spark, None, pairs, maxIters, checkpointDir)._1
    finally pairs.unpersist(blocking = false)
  }

  /** Distributed connected components via Shiloach–Vishkin-style
    * hooking + pointer doubling: each round first takes the min over
    * direct neighbors' labels (hooking — a join + map-side-combined
    * `min` aggregate), then shortcuts `label ← label(label)` (pointer
    * doubling — a self-join on the label table). The reach of a label
    * at least doubles per round, so convergence is O(log diameter)
    * joins, not O(diameter) — a 1000-node chain converges in ~10 rounds
    * (pinned in DedupSpec) where plain min-propagation needs 1000. The
    * driver only ever sees a converged flag; labels never leave the
    * cluster.
    *
    * Lineage is truncated every round so the plan stays flat across
    * iterations. With `checkpointDir` set, rounds checkpoint RELIABLY
    * (HDFS/object-store dir) — an executor loss mid-job recomputes from
    * the last checkpoint instead of killing a 100 TB clustering run;
    * the `localCheckpoint` fallback (executor block store) is for
    * local/test runs only.
    *
    * Invariants that make the doubling join total: labels start as
    * `id`, min-hooking only ever lowers them, and every label value is
    * itself an id — so `label(label)` always resolves (inner join is
    * safe). Returns (labels, roundsRun); aborts loudly rather than
    * returning a silently non-converged labeling. On ANY failure path
    * (non-convergence abort included) the tracked checkpoint files of
    * the in-flight round are deleted — repeated failed runs must not
    * accumulate a labels copy each (ADVICE r3).
    *
    * Side effect: `checkpointDir` is installed via
    * `SparkContext.setCheckpointDir`, which is GLOBAL to the session —
    * concurrent jobs relying on a different checkpoint dir should not
    * share the SparkContext with this call. */
  def ccLabels(spark: SparkSession, ids: DataFrame, pairs: DataFrame,
      maxIters: Int = 64, checkpointDir: Option[String] = None): (DataFrame, Int) =
    ccLabels(spark, Option(ids), pairs, maxIters, checkpointDir)

  /** Core loop. `ids = None` labels exactly the EDGE ENDPOINTS (every
    * endpoint appears as a src of the undirected frame, so round 1's
    * hooking aggregate doubles as the vertex seed — no separate distinct
    * materialization and no round-1 labels join). Callers with vertices
    * outside every edge (singletons) must pass them explicitly. */
  def ccLabels(spark: SparkSession, ids: Option[DataFrame], pairs: DataFrame,
      maxIters: Int, checkpointDir: Option[String]): (DataFrame, Int) = {
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def snapshot(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)

    // Reliable checkpoints are NOT garbage-collected by Spark (the
    // cleaner is off by default and GC-driven even when on): without
    // cleanup a long clustering run accumulates one full labels copy per
    // round. Track the files each round creates and delete a round's
    // files once the NEXT round's snapshot has materialized (the final
    // round's checkpoint backs the returned DataFrame and is kept).
    // Assumes one clustering job per checkpoint dir at a time.
    def listCk(): Set[org.apache.hadoop.fs.Path] =
      if (checkpointDir.isEmpty) Set.empty
      else spark.sparkContext.getCheckpointDir.map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) Set.empty[org.apache.hadoop.fs.Path]
        else fs.listStatus(p).map(_.getPath).toSet
      }.getOrElse(Set.empty)
    def deleteCk(paths: Set[org.apache.hadoop.fs.Path]): Unit =
      paths.foreach { p =>
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    var prevRoundFiles: Set[org.apache.hadoop.fs.Path] = Set.empty
    def snapshotTracked(df: DataFrame): DataFrame = {
      val before = listCk()
      val out = snapshot(df)
      val created = listCk() -- before
      deleteCk(prevRoundFiles) // superseded by the snapshot just taken
      prevRoundFiles = created
      out
    }

    val edges = pairs.toDF("a", "b")
    val undirected = edges.union(edges.select(col("b"), col("a")))
      .toDF("src", "dst").persist()
    var labels: DataFrame = null
    var iter = 0
    var converged = false
    var returning = false
    try {
      // no snapshot for the seed: it is one column duplication over `ids`
      // (when given) — re-evaluating it inside round 1's joins is
      // cheaper than a dedicated materialization job
      labels = ids.map(_.select(col("id")).withColumn("label", col("id"))).orNull
      while (!converged && iter < maxIters) {
        // hooking: candidate = min(own label, neighbors' labels); carry
        // the pre-round label so the convergence check is a scan of the
        // cached frame, not another join. Round 1 needs no labels join
        // for the neighbor min — labels are the identity, so
        // label(dst) = dst and a plain aggregate over the edges
        // suffices; with no explicit ids it IS the whole round (the
        // aggregate's keys are the vertex set).
        val hooked = (
          if (iter == 0 && labels == null)
            undirected.groupBy(col("src")).agg(min(col("dst")).as("nbr"))
              .select(col("src").as("id"),
                least(col("src"), col("nbr")).as("label"),
                col("src").as("old"))
          else {
            val nbrMin =
              (if (iter == 0) undirected.select(col("src"), col("dst").as("label"))
               else undirected.join(labels, undirected("dst") === labels("id"))
                 .select(undirected("src"), col("label")))
                .groupBy(col("src")).agg(min(col("label")).as("nbr"))
            labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
              .select(labels("id"),
                least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
                labels("label").as("old"))
          })
          // persist: the hooking subtree (the round's expensive
          // join+agg) feeds the convergence check AND both sides of the
          // doubling self-join — without it each reference would
          // re-evaluate the joins (ADVICE r3)
          .persist()
        // convergence is decided on the HOOKING output, before paying the
        // doubling join: hooking-stability alone implies the min-label
        // fixpoint — stable means L(x) = min(L(x), min_nbr L(nbr)), so
        // for every edge (u,v) both L(u) ≤ L(v) and L(v) ≤ L(u), i.e.
        // labels are CONSTANT within each component; with the invariants
        // L(x) ≤ x and L(x) ∈ component(x), that constant is the
        // component min (evaluate at the min vertex m: L(m) ≤ m and
        // L(m) ≥ m). Doubling is purely an accelerator, so the final
        // confirm round skips its join and checkpoint outright.
        converged = hooked.where(col("label") =!= col("old")).limit(1).count() == 0
        if (converged && labels == null)
          labels = hooked.select(col("id"), col("label")) // empty edge set
        if (!converged) {
          // shortcutting: label ← label(label) (pointer doubling)
          val l = hooked.select(col("id").as("lid"), col("label").as("llabel"))
          labels = snapshotTracked(
            hooked.join(l, hooked("label") === l("lid"))
              .select(hooked("id"), col("llabel").as("label")))
        }
        hooked.unpersist() // converged: labels unchanged; else: snapshotted
        iter += 1
      }
      require(converged,
        s"connected components did not converge within $maxIters rounds — " +
          "labels would silently disagree with the transitive-closure oracle")
      returning = true
      (labels, iter)
    } finally {
      undirected.unpersist()
      // failure path (exception or the non-convergence abort): the final
      // round's checkpoint no longer backs anything returned — delete it
      if (!returning) deleteCk(prevRoundFiles)
    }
  }

  /** 60-bit SimHash near-dup detection over the field-valued word hashes:
    * per-word ±1 votes per bit; candidates share a 15-bit band (4 bands);
    * near-dups have Hamming ≤ 6. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val banded0 = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .flatMap { case (id, text) =>
        val wh = wordHashes(text)
        if (wh.isEmpty) Iterator.empty
        else {
          val votes = new Array[Int](60)
          var i = 0
          while (i < wh.length) {
            val h = wh(i)
            var bit = 0
            while (bit < 60) {
              if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
              bit += 1
            }
            i += 1
          }
          var fp = 0L
          var bit = 0
          while (bit < 60) { if (votes(bit) > 0) fp |= (1L << bit); bit += 1 }
          (0 until 4).iterator.map(b => (id, fp, b, (fp >>> (b * 15)) & 0x7fffL))
        }
      }.toDF("doc_id", "fp", "band_idx", "band")

    // window-count cap over the one band exchange (same rationale and
    // row-for-row same result as minhashLsh's — see there)
    val wBand = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band")
    val banded = banded0.withColumn("bsz", count(lit(1)).over(wBand))
      .where(col("bsz") <= MaxBucket).drop("bsz")

    val a = banded.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band_idx", "band"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= 6)
  }

  /** Embedding-cosine near-dup: each vector's nearest neighbor by cosine
    * plus a duplicate flag (`cosine >= threshold`).
    *
    * Round-2 formulation (replaces the round-1 driver `collect()` +
    * whole-corpus broadcast, VERDICT.md "What's wrong" #1): the shared
    * IVF coarse quantizer ([[Similarity.trainQuantizer]], bounded sample)
    * assigns every corpus vector to one cell; every vector — as its own
    * query — probes `nprobe` cells; candidates are the cell equi-join of
    * the two faces; the per-vector argmax is a `max(struct(cosine,
    * -nn_id))` hash aggregate, so the candidate stream is collapsed by
    * map-side partial aggregation inside each task — candidate rows never
    * cross a shuffle (a window rank here would shuffle the whole
    * candidate stream). Only the 16 centroids are broadcast; the corpus
    * is mapped, never collected.
    *
    * `nprobe` defaults to ALL cells here: exact mode, because the raw
    * synthetic embeddings are noise-like (measured max pairwise cosine
    * ≈ 0.49 — no near-dup structure), so no sublinear candidate set can
    * contain every true nearest neighbor and the exact all-pairs DuckDB
    * oracle demands equality (driver face: `dedup_embedding_nn_exact`).
    * Exact NN is intrinsically O(n²·d) compute; this plan distributes it
    * memory-safely. On a corpus WITH dup structure `nprobe` ≪
    * `numCentroids` is the production setting — dup-grade neighbors
    * (cosine ≥ threshold) share nearest cells — and that sublinear shape
    * IS the registered default (`dedup_embedding_nn`: every vector gets a
    * planted near-dup, nprobe=6 of 16, and the oracle requires every
    * ≥0.95 pair recovered exactly; `dedup_embedding_nn_probe` covers the
    * partial-dup corpus where most vectors have no dup).
    *
    * Numerics: `dot_f64` is a strict left-to-right float→double sum,
    * bit-identical to DuckDB's `list_dot_product` oracle.
    *
    * Scaling the cell count: with `numCentroids` FIXED, within-cell
    * candidate pairs grow quadratically in corpus size (measured in
    * BENCH.md "Round 5": 4× vectors → ~16× pair work on the sf1.0
    * sweep, the one super-linear family there). The oracle-parity
    * faces pin 16 cells so the DuckDB replay stays tractable;
    * production sizes cells at constant occupancy — `numCentroids ≈
    * n / targetCellSize` (the standard IVF law) — which restores
    * linear total candidate work at any corpus size and is exactly
    * what this parameter is for.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.95, numCentroids: Int = 16, nprobe: Int = -1,
      lloydIters: Int = 5, sampleCap: Int = 4096): DataFrame = {
    import spark.implicits._
    embeddingNearDupOn(spark,
      TableIO(spark, sfDir).read("embeddings")
        .select("vec_id", "embedding").as[(Long, Array[Float])],
      threshold, numCentroids, nprobe, lloydIters, sampleCap)
  }

  /** Dataset-level core of [[embeddingNearDup]] (the planted-dup probe
    * query builds its own corpus here). */
  def embeddingNearDupOn(spark: SparkSession,
      emb: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      threshold: Double = 0.95, numCentroids: Int = 16, nprobe: Int = -1,
      lloydIters: Int = 5, sampleCap: Int = 4096): DataFrame = {
    import spark.implicits._
    VectorFunctions.register(spark)
    val q = Similarity.trainQuantizer(emb, numCentroids, lloydIters, sampleCap)
    val bcQ = spark.sparkContext.broadcast(q)
    val probeN = if (nprobe <= 0) numCentroids else nprobe

    // the streamed side of the cell join carries all candidate dot
    // products — rebalance a degenerate single-row-group scan first;
    // the probe side derives from the SAME spread, so the two cell-join
    // inputs reuse one exchange and the probe kernel is parallel too
    val spread = Similarity.rebalanceSmall(emb)
    val corpus = spread.map { case (id, v) =>
      var n = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; n += x * x; j += 1 }
      (bcQ.value.nearest(v), id, v, math.sqrt(n))
    }.toDF("cell", "corpus_id", "embedding", "corpus_norm")

    val probes = spread.flatMap { case (id, v) =>
      var n = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; n += x * x; j += 1 }
      val nrm = math.sqrt(n)
      bcQ.value.probe(v, probeN).iterator.map(c => (c, id, v, nrm))
    }.toDF("cell", "vec_id", "q_embedding", "query_norm")

    // a corpus vector lives in exactly ONE cell and probe cells are
    // distinct ⇒ each (vec_id, corpus_id) candidate appears at most once
    val dotF = call_function("dot_f64", col("embedding"), col("q_embedding"))
    corpus.join(probes, "cell")
      .where(col("corpus_id") =!= col("vec_id"))
      .select(col("vec_id"), col("corpus_id").as("nn_id"),
        (dotF / (col("corpus_norm") * col("query_norm"))).as("cosine"))
      // lexicographic struct max == ORDER BY cosine DESC, nn_id ASC
      .groupBy("vec_id")
      .agg(max(struct(col("cosine"), (-col("nn_id")).as("neg_nn"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_nn")).as("nn_id"),
        col("m.cosine").as("cosine"),
        when(col("m.cosine") >= threshold, 1L).otherwise(0L).as("is_dup"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-Efficient Learning at
    * Web-Scale through Semantic Deduplication"): k-means-cluster the
    * embedding space, then look for near-duplicate pairs ONLY within a
    * cluster — the cluster bound is what makes semantic dedup tractable
    * at web scale: within-cluster pair count is Σ n_c², not n², and
    * `numCentroids` grows with the corpus (the paper uses tens of
    * thousands of clusters at web scale) so cells stay partition-sized.
    * One-pass keep-lowest-id variant: a vector is DROPPED when a
    * lower-id vector in its cell has cosine ≥ `threshold`; the reported
    * `kept_id` is the smallest such partner (deterministic, no RNG —
    * the paper keeps a random exemplar per duplicate group).
    *
    * Scale shape: quantizer trained on a bounded sample
    * ([[Similarity.trainQuantizer]], collect ≤ `sampleCap`), centroids
    * broadcast, cell assignment row-local; the only exchange is the
    * within-cell self-join (equi-join on `cell`, AQE splits skewed
    * cells). Boundary caveat inherited from the paper: a cross-cell
    * near-dup pair is invisible by design (recall is bounded by the
    * clustering); [[embeddingNearDupOn]] with nprobe > 1 is the face
    * that trades more candidate cells for recall.
    *
    * Emits (vec_id, kept_id, cell, cosine) — one row per dropped
    * vector. Oracle: [[OracleGen.semanticDedupSql]] replays training,
    * assignment, and the pair scan bit-exactly. */
  def semanticOn(spark: SparkSession,
      emb: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      threshold: Double = 0.95, numCentroids: Int = 16,
      lloydIters: Int = 5, sampleCap: Int = 4096): DataFrame = {
    import spark.implicits._
    VectorFunctions.register(spark)
    val q = Similarity.trainQuantizer(emb, numCentroids, lloydIters, sampleCap)
    val bcQ = spark.sparkContext.broadcast(q)
    // rebalance a degenerate single-row-group scan before the
    // within-cell pair scan (both join sides derive from `cells`)
    val cells = Similarity.rebalanceSmall(emb).map { case (id, v) =>
      var n = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; n += x * x; j += 1 }
      (bcQ.value.nearest(v), id, v, math.sqrt(n))
    }.toDF("cell", "vec_id", "embedding", "nrm")

    val lo = cells.select(col("cell"), col("vec_id").as("ka"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val hi = cells.select(col("cell"), col("vec_id").as("kb"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val dotF = call_function("dot_f64", col("a_emb"), col("b_emb"))
    lo.join(hi, Seq("cell"))
      .where(col("ka") < col("kb"))
      .select(col("cell"), col("ka"), col("kb"),
        (dotF / (col("a_nrm") * col("b_nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
      // smallest keeper per dropped vector: ka is unique within the
      // group, so the lexicographic struct min is min-by-ka
      .groupBy(col("kb"))
      .agg(min(struct(col("ka"), col("cosine"), col("cell"))).as("m"))
      .select(col("kb").as("vec_id"), col("m.ka").as("kept_id"),
        col("m.cell").as("cell"), col("m.cosine").as("cosine"))
  }

  /** Exact-substring duplicate spans — the suffix-array dedup of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better") re-expressed in the shapes that distribute: instead of one
    * monolithic suffix array, every word position anchors a fixed-`k`
    * word-gram hash; a gram occurring ≥ `minCount` times ANYWHERE in the
    * corpus (cross-document or self-repeat — Lee et al. drop both) marks
    * its window duplicated, and per document the overlapping duplicated
    * windows merge into maximal spans — exactly the spans a suffix-array
    * scan at threshold `k` finds, because any duplicated span of length
    * ≥ k is covered by duplicated k-grams at every offset inside it.
    *
    * Scale shape: the posting stream is one row per word position
    * (linear — this family never forms pairs, so no hot-bucket cap is
    * needed: a boilerplate gram with a billion occurrences contributes a
    * billion rows, not a billion²); duplicated-gram membership is a
    * window count riding the
    * gram exchange (one gram pass — the former aggregate-plus-join ran
    * the flatMap once per plan reference); the island merge shuffles
    * (doc_id, pos) pairs once.
    *
    * Emits (doc_id, span_idx, start_word, end_word, n_words) — spans are
    * word-indexed [start, end), 0-based, ordered per doc. */
  def substringSpansOn(spark: SparkSession,
      docs: org.apache.spark.sql.Dataset[(Long, String)],
      k: Int = 20, minCount: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val grams = TableIO.rebalanceSmall(docs).flatMap { case (id, text) =>
      val whs = wordHashes(text)
      if (whs.length < k) Iterator.empty
      else (0 to whs.length - k).iterator.map(i =>
        (id, i.toLong, Hash61.shingleN(whs, i, k)))
    }.toDF("doc_id", "pos", "gram")
    // duplicated-gram membership as a window count over the one gram
    // exchange instead of an aggregate joined back — the join shape ran
    // the gram flatMap once per plan reference (guide §1.2/§2.4); same
    // rows survive (count ≥ minCount per gram is unchanged)
    val wGram = Window.partitionBy("gram")
    val hits = grams.withColumn("c", count(lit(1)).over(wGram))
      .where(col("c") >= minCount).select("doc_id", "pos")
    // gaps-and-islands: windows [pos, pos+k) merge while they overlap
    // (pos < prev + k); all windows share one length, so the previous
    // pos carries the running end
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") >= lag(col("pos"), 1).over(w) + k, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start_word"), (max(col("pos")) + k).as("end_word"))
      .select(col("doc_id"),
        (col("island") - 1).cast("int").as("span_idx"),
        col("start_word"), col("end_word"),
        (col("end_word") - col("start_word")).as("n_words"))
  }

  /** Driver face of [[substringSpansOn]] over the `documents` table,
    * with planted duplication so the operator is non-vacuously oracle-
    * checked at every SF: documents with doc_id % 5 == 2 get the first
    * `spanWords` words of document (doc_id % 40) spliced in front — a
    * ≥k-word run duplicated across documents that the span merge must
    * recover (the corpus's natural exact-duplicate texts surface as
    * full-document spans on both sides too). */
  def substringSpans(spark: SparkSession, sfDir: String,
      k: Int = 20, spanWords: Int = 25): DataFrame = {
    import spark.implicits._
    val docs = TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)]
    val srcSpans: Map[Long, String] = TableIO(spark, sfDir).read("documents")
      .where(col("doc_id") < 40)
      .select(col("doc_id"), expr(
        s"array_join(slice(filter(split(text, ' '), w -> w != ''), 1, $spanWords), ' ')").as("span"))
      .as[(Long, String)].collect().toMap
    // the splice plant addresses doc_ids 0..39 by construction; a corpus
    // missing one would throw NoSuchElementException on an executor while
    // the oracle's inner join silently dropped the row — make the shape
    // assumption loud on the driver instead (ADVICE r4)
    require(srcSpans.size == 40,
      s"substringSpans plant needs doc_ids 0..39 present; found ${srcSpans.size}")
    val bcSpans = spark.sparkContext.broadcast(srcSpans)
    substringSpansOn(spark, docs.map { case (id, text) =>
      (id, if (id % 5 == 2) bcSpans.value(id % 40) + " " + text else text)
    }, k)
  }

  /** Exact n-gram Jaccard via an inverted index: explode distinct gram
    * hashes, drop hot grams (stopword-like shingles shared by a large
    * corpus fraction — they only generate noise pairs), self-join on the
    * gram, count shared grams per pair with a hash aggregate, then
    * Jaccard = shared / (|A| + |B| − shared). No arrays cross the join —
    * the pair stream is (doc_a, doc_b) keys only, map-side combined.
    * This is the formulation that survives 100 TB. */
  def ngramJaccard(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    import spark.implicits._
    val docGrams = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) => (id, shingleHashes(text).distinct) }
      .toDF("doc_id", "grams")
      .where(size(col("grams")) > 0)

    // each posting row CARRIES its document's gram count, so the pair
    // aggregate below yields (shared, n_a, n_b) in one go — the previous
    // shape joined a per-doc sizes frame back twice, and each of those
    // joins (plus the df aggregate and both self-join sides) re-ran the
    // shingle kernel: 6 corpus passes where one suffices (guide §1.2).
    // The df cap is a window count riding the single gram exchange,
    // which the self-join's two sides then reuse (guide §2.4).
    val posting = docGrams.select(col("doc_id"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("gram"))
    val wGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val filtered = posting.withColumn("df", count(lit(1)).over(wGram))
      .where(col("df") <= MaxBucket).drop("df")

    // n_a/n_b are functions of doc_a/doc_b, so adding them to the
    // grouping keys changes no group
    filtered.select(col("gram"), col("doc_id").as("doc_a"), col("n_grams").as("n_a"))
      .join(filtered.select(col("gram"), col("doc_id").as("doc_b"),
        col("n_grams").as("n_b")), "gram")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared"))).as("jaccard"))
      .where(col("jaccard") > 0.2)
  }

  // ── Canonical-URL dedup (the CommonCrawl-style URL-level pass that
  // runs BEFORE any content dedup: tracking params, fragments, case and
  // default ports must not make one page look like five) ──────────────
  //
  // The corpus has no URL column, so the variants are planted closed-form
  // (like base_url / pii_scrub): five docs share one article key
  // (doc_id / 5) and each wears a different non-canonical dressing by
  // doc_id % 5 — plain / uppercased / default port + fragment /
  // utm-tracking query / trailing slash. Canonicalization is pure column
  // algebra (codegen'd regexp/lower — no UDF), and every pattern is in
  // the shared Java/RE2 subset with no replacement backrefs, so the
  // DuckDB oracle runs the SAME pattern strings.

  /** The planted raw URL for a document (Spark Column). */
  private def plantedUrl: org.apache.spark.sql.Column = {
    // exact integer division (matching the oracle's //), never the
    // double-promoting `/` that drifts past 2^53
    val k = expr("doc_id div 5")
    val base = concat(lit("http://example.com/articles/"), k)
    when(pmod(col("doc_id"), lit(5)) === 0, base)
      .when(pmod(col("doc_id"), lit(5)) === 1,
        concat(lit("HTTP://EXAMPLE.COM/articles/"), k))
      .when(pmod(col("doc_id"), lit(5)) === 2,
        concat(lit("http://example.com:80/articles/"), k, lit("#section-2")))
      .when(pmod(col("doc_id"), lit(5)) === 3,
        concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .otherwise(concat(base, lit("/")))
  }

  /** Canonicalize a URL column: drop the fragment, drop an all-tracking
    * query string, lowercase, strip the default port, strip one trailing
    * slash. Order matters (the fragment can follow the port). */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[^#]*$", "")
    val lowered = lower(noUtm)
    val noPort = regexp_replace(lowered, ":80/", "/")
    regexp_replace(noPort, "/$", "")
  }

  /** URL-level dedup groups: canonical url → occurrence count + keeper
    * (min doc_id), the exact shape of [[exact]]. One map-side-combined
    * hash aggregate — no join, no window, safe at any corpus size. */
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame =
    TableIO(spark, sfDir).read("documents")
      .select(col("doc_id"), canonicalUrl(plantedUrl).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  /** SQL replay of [[urlDedup]]: same plant, same patterns, same 'g'
    * flag semantics (anchored patterns match at most once anyway). */
  def urlDedupSql(): String =
    "WITH raw AS (SELECT doc_id, CASE CAST(doc_id % 5 AS INTEGER) " +
      "WHEN 0 THEN 'http://example.com/articles/' || (doc_id // 5) " +
      "WHEN 1 THEN 'HTTP://EXAMPLE.COM/articles/' || (doc_id // 5) " +
      "WHEN 2 THEN 'http://example.com:80/articles/' || (doc_id // 5) || '#section-2' " +
      "WHEN 3 THEN 'http://example.com/articles/' || (doc_id // 5) || '?utm_source=feed&utm_campaign=x' " +
      "ELSE 'http://example.com/articles/' || (doc_id // 5) || '/' END AS url FROM documents), " +
      // 'g' everywhere: Spark's regexp_replace is replace-ALL, DuckDB's
      // default is first-only — only ':80/' is unanchored, but keep the
      // semantics identical pattern-for-pattern
      "canon AS (SELECT doc_id, regexp_replace(regexp_replace(lower(" +
      "regexp_replace(regexp_replace(url, '#.*$', '', 'g'), '\\?utm_[^#]*$', '', 'g')" +
      "), ':80/', '/', 'g'), '/$', '', 'g') AS canon_url FROM raw) " +
      "SELECT canon_url, COUNT(*) AS cnt, MIN(doc_id) AS keeper " +
      "FROM canon GROUP BY canon_url"
}
