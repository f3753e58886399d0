package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for ingest pipelines: fingerprint the
  * content, then `dropDuplicatesWithinWatermark` — the state store
  * keeps one entry per fingerprint only until the watermark passes it,
  * so state is bounded by the dedup horizon instead of the stream's
  * whole history (a full-history streaming dedup is a memory leak by
  * construction at 100 TB/day ingest rates).
  */
object StreamingDedup {

  /** Emit only the first occurrence of each content fingerprint within
    * the watermark horizon. `tsCol` is the event-time column the
    * watermark is declared on. */
  def dropExactWithinWatermark(df: DataFrame, textCol: String,
                               tsCol: String,
                               delay: String = "10 minutes"): DataFrame =
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming SEMANTIC dedup: drop documents whose embedding
    * product-quantizes to the SAME code word as earlier stream content
    * — the ingest-side mirror of SemDeDup-style embedding dedup, with
    * PQ as the similarity radius (two embeddings share all m codes iff
    * every subvector falls in the same Voronoi cell; raise m /
    * codesPerSub to tighten). Map-only codegen'd encode
    * ([[graft.functions.PqEncodeExpr]], codebook as plan constant) +
    * ONE `dropDuplicatesWithinWatermark` on the code-word hash —
    * state is one entry per distinct code word in the horizon,
    * bounded by m·log2(codesPerSub) bits of key space and the
    * watermark, whichever is smaller. */
  def dropSemanticWithinWatermark(df: DataFrame, vecCol: String,
                                  tsCol: String, cb: Array[Double],
                                  m: Int, codesPerSub: Int,
                                  delay: String = "10 minutes"): DataFrame = {
    val subDim = cb.length / (m * codesPerSub)
    df.withColumn("__pq",
        graft.functions.VectorExprs.pqEncode(
          col(vecCol).cast("array<double>"), cb, m, codesPerSub, subDim))
      .filter(col("__pq").isNotNull)
      .withColumn("__pqh", md5(concat_ws(",", col("__pq"))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__pqh")
      .drop("__pq", "__pqh")
  }

  /** Within-stream FUZZY near-dup drop — the streaming mirror of
    * [[graft.ops.Dedup.dropNearDups]] at LSH-candidate granularity:
    * each document explodes to its MinHash band keys, each band key is
    * deduped within the watermark horizon, and a document SURVIVES iff
    * it was the first claimant of ALL its bands (any band already
    * claimed ⇒ the doc is an LSH candidate against earlier content ⇒
    * dropped). Same posture as the streaming contamination family:
    * over-drops on LSH false positives — there is no stored earlier
    * text to Jaccard-verify against without unbounded state — but
    * NEVER leaks a candidate duplicate.
    *
    * Two chained stateful operators, both watermark-bounded (the
    * multi-stateful-operator shape Structured Streaming supports when
    * every stage is event-time based): (1)
    * `dropDuplicatesWithinWatermark` over (band_idx, band_hash) —
    * state = one entry per band key within the horizon; (2) an
    * append-mode windowed count per document — a doc's band rows all
    * carry its own event time, so the count arrives complete and the
    * window emits survivors once the watermark passes. State is
    * O(band keys in horizon) + O(docs per open window): bounded.
    *
    * Returns (window, idCol, textCol) of surviving documents; rows
    * appear AFTER the watermark passes their window end (the price of
    * the final aggregation — downstream sinks see a delayed but
    * exactly-once survivor stream). Ties inside one microbatch keep
    * the dedup operator's first-encountered row (the
    * [[dropExactWithinWatermark]] contract). */
  def dropNearDupsWithinWatermark(df: DataFrame, textCol: String,
                                  idCol: String, tsCol: String,
                                  numHashes: Int = 4, bandSize: Int = 1,
                                  k: Int = 3,
                                  delay: String = "10 minutes",
                                  windowLen: String = "1 minute"): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val nBands = numHashes / bandSize
    val sig = graft.ops.Dedup.withMinhashSignature(df, textCol, numHashes, k)
    val bands = sig.select(
      col(idCol), col(tsCol), col(textCol),
      posexplode(array((0 until nBands).map(b =>
        graft.ops.Dedup.bandHash((0 until bandSize).map(j =>
          col(s"mh${b * bandSize + j}")))): _*))
        .as(Seq("band_idx", "band_hash")))
    bands
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("band_idx", "band_hash")
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("__n_won"), first(col(textCol)).as(textCol))
      .filter(col("__n_won") === nBands)
      .drop("__n_won")
  }

  /** Streaming INCREMENTAL dedup against a persisted corpus band index
    * — the streaming mirror of
    * [[graft.ops.Dedup.dropNearDupsAgainstIndex]] at LSH-CANDIDATE
    * granularity: a stream document is dropped iff ANY of its band
    * keys already exists in the corpus index (built by
    * [[graft.ops.Dedup.bandIndex]] / read back via
    * [[graft.api.Layout.table]] — bucketed, so each lookup join reads
    * co-located index files). Same over-drop posture as
    * [[dropNearDupsWithinWatermark]]: candidates are dropped without
    * a Jaccard verify (verifying would need the corpus text joined
    * per candidate — run the batch path for audit-grade pairs) but a
    * candidate duplicate can NEVER leak.
    *
    * Plan shape: the nBands band keys are computed as COLUMNS (no
    * explode), and each is one stream-static LEFT join against the
    * index's distinct key set — the per-row verdict needs no
    * aggregation, so the operator is fully STATELESS (no watermark,
    * no state store; within-stream duplicates are
    * [[dropNearDupsWithinWatermark]]'s job, chained upstream).
    * Parameter contract as [[graft.ops.Dedup.bandIndex]]: numHashes/
    * bandSize/k/useMd5 must match the index build — the defaults here
    * equal bandIndex's defaults, so default-reliant callers on both
    * sides stay in contract (a skewed default would silently consult
    * only a prefix of the index's bands: reduced recall, no error).
    * DELTA-aware by composition: only `band_key` (and the cfg guard)
    * is read from `index`, so pass
    * `index.unionByName(delta.select(index.columns...))` to consult
    * survivors admitted since the last compaction — same for the
    * hamming mirror and the bloom builders. Texts shorter than
    * k tokens have null signatures and share one degenerate key per
    * band — prefilter them (Gopher/C4 gates do) or accept that they
    * match a corpus that also contains such texts. */
  def dropNearDupsAgainstIndex(stream: DataFrame, index: DataFrame,
                               textCol: String,
                               numHashes: Int = 6, bandSize: Int = 1,
                               k: Int = 3,
                               useMd5: Boolean = false): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val nBands = numHashes / bandSize
    // the distinct key set is pinned ONCE at operator construction
    // (localCheckpoint): a bare static frame re-evaluates per
    // micro-batch, which would re-scan + re-shuffle the corpus-sized
    // index on every trigger × nBands joins. The distinct itself is
    // also load-bearing: a multi-member bucket would fan a matching
    // stream row out per member INTO the next band join
    // (multiplicative across bands) — with unique keys each lookup
    // yields at most one row per stream row. Key blocks are compact
    // (one 32-byte hash per distinct band key) and release with the
    // frame ([[graft.api.Caches.release]]).
    val cfg = graft.ops.Dedup.minhashCfg(numHashes, bandSize, k, useMd5)
    val keys = graft.ops.Dedup.requireCfg(index, cfg)
      .select("band_key").distinct().localCheckpoint()
    val sig = graft.ops.Dedup.withMinhashSignature(
      stream, textCol, numHashes, k, useMd5)
    val keyed = (0 until nBands).foldLeft(sig) { (d, b) =>
      d.withColumn(s"__bk$b",
        graft.ops.Dedup.bandKeyExpr(cfg, lit(b), (0 until bandSize).map(j =>
          col(s"mh${b * bandSize + j}"))))
    }
    val joined = (0 until nBands).foldLeft(keyed) { (d, b) =>
      d.join(
        keys.select(col("band_key").as(s"__bk$b"))
          .withColumn(s"__hit$b", lit(1)),
        Seq(s"__bk$b"), "left_outer")
    }
    val survives = (0 until nBands)
      .map(b => col(s"__hit$b").isNull).reduce(_ && _)
    joined.filter(survives)
      .drop((0 until nBands).flatMap(b =>
        Seq(s"__bk$b", s"__hit$b")) ++
        (0 until numHashes).map(h => s"mh$h"): _*)
  }

  /** [[dropNearDupsAgainstIndex]] at 100 TB corpus scale: the
    * join formulation above re-joins the corpus-sized distinct key set
    * on EVERY micro-batch × nBands — at billions of keys each trigger
    * pays multi-GB static-side shuffles or an impossible broadcast
    * (r16 advice). This variant replaces all of it with a MAP-ONLY
    * bloom membership test: the filter over the index's distinct band
    * keys ships as a plan constant ([[graft.ops.Dedup.bandKeyBloom]],
    * built ONCE), deserialized once per executor, one probe per band
    * per row — zero joins, zero state, zero per-trigger static cost.
    *
    * Posture delta vs the join formulation, explicitly: the bloom's
    * false positives (rate `fpp`) OVER-drop documents whose band key
    * is NOT in the corpus — acceptable under the same candidate-grain
    * over-drop contract the join path already has (LSH candidates are
    * dropped unverified there too); there are NO false negatives
    * (bit-identical build/probe hash), so a candidate duplicate still
    * can NEVER leak. The exact key join remains the batch-path
    * verifier ([[graft.ops.Dedup.nearDupsAgainstIndex]] — run it for
    * audit-grade pairs). Build/query parameter mismatch is refused at
    * construction via the bloom's config stamp — load-bearing, because
    * a silent mismatch here would UNDER-drop (keys never match), the
    * one direction the contract cannot absorb. */
  def dropNearDupsAgainstIndexBloom(stream: DataFrame,
                                    bloom: graft.ops.Dedup.BandKeyBloom,
                                    textCol: String,
                                    numHashes: Int = 6, bandSize: Int = 1,
                                    k: Int = 3,
                                    useMd5: Boolean = false): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val cfg = graft.ops.Dedup.minhashCfg(numHashes, bandSize, k, useMd5)
    require(bloom.cfg == cfg,
      s"band-key bloom built for '${bloom.cfg}' but queried with '$cfg' " +
        "— numHashes/bandSize/k/useMd5 must match the index the bloom " +
        "was built from (a mismatch would silently drop NOTHING)")
    val nBands = numHashes / bandSize
    val sig = graft.ops.Dedup.withMinhashSignature(
      stream, textCol, numHashes, k, useMd5)
    val contains = graft.ops.Dedup.bloomKeyFilter(stream.sparkSession, bloom)
    val hit = (0 until nBands).map { b =>
      contains(graft.ops.Dedup.bandKeyExpr(cfg, lit(b),
        (0 until bandSize).map(j => col(s"mh${b * bandSize + j}"))))
    }.reduce(_ || _)
    sig.filter(!hit)
      .drop((0 until numHashes).map(h => s"mh$h"): _*)
  }

  /** Streaming INCREMENTAL near-dup drop for the HAMMING/multimodal
    * family — the [[dropNearDupsAgainstIndex]] mate over any ≤64-bit
    * signature column (SimHash text, image dHash, audio envelope,
    * video frame fingerprints: exactly the ingest shapes that arrive
    * as streams). A row is dropped iff ANY of its maxHamming+1
    * pigeonhole band keys exists in the corpus index (built by
    * [[graft.ops.Dedup.hammingBandIndex]]). Same shape as the MinHash
    * mirror: band keys as COLUMNS (no explode), one stream-static LEFT
    * join per band against the index's distinct key set (pinned once
    * at construction), fully STATELESS. Same over-drop posture at
    * candidate grain — strictly milder here than for MinHash: a band
    * hit means EXACT equality on sigBits/(maxHamming+1) signature
    * bits, and the batch path's verify needs no content join anyway.
    * CONTRACT: sigBits/maxHamming must match the index build
    * (key-folded + loud via the index's cfg stamp). */
  def dropNearDupsAgainstHammingIndex(stream: DataFrame, index: DataFrame,
                                      sigCol: String, sigBits: Int,
                                      maxHamming: Int): DataFrame = {
    val cfg = graft.ops.Dedup.hammingCfg(sigBits, maxHamming)
    val nBands = maxHamming + 1
    val keys = graft.ops.Dedup.requireCfg(index, cfg)
      .select("band_key").distinct().localCheckpoint()
    val keyCols = graft.ops.Dedup.hammingBandKeyCols(
      col(sigCol), sigBits, maxHamming)
    val keyed = keyCols.zipWithIndex.foldLeft(stream) {
      case (d, (kc, b)) => d.withColumn(s"__bk$b", kc)
    }
    val joined = (0 until nBands).foldLeft(keyed) { (d, b) =>
      d.join(
        keys.select(col("band_key").as(s"__bk$b"))
          .withColumn(s"__hit$b", lit(1)),
        Seq(s"__bk$b"), "left_outer")
    }
    val survives = (0 until nBands)
      .map(b => col(s"__hit$b").isNull).reduce(_ && _)
    joined.filter(survives)
      .drop((0 until nBands).flatMap(b => Seq(s"__bk$b", s"__hit$b")): _*)
  }

  /** Streaming INCREMENTAL SEMANTIC dedup against a persisted cell
    * index ([[graft.ops.Similarity.semanticCellIndex]]) — the third
    * modality's streaming mate, and the only one with EXACT (not
    * candidate-grain) semantics: the index carries the corpus vectors,
    * so one stream-static LEFT ANTI join whose condition embeds the
    * cosine verify drops a document iff a same-cell corpus embedding
    * has cos ≥ threshold. Assignment is the codegen'd map-only
    * NearestCentroid expression (bit-compatible with the index build's
    * assignment — same rounded cosine, min-cid ties), so the plan has
    * zero aggregations and zero state operators. The index is pinned
    * once at construction; each trigger re-joins it — corpus-scale
    * static side, the price of exactness (cosine is not bloomable the
    * way band-key membership is). Quantizer mismatch throws at scan
    * time via the cfg stamp. */
  def dropSemanticAgainstCellIndex(stream: DataFrame, index: DataFrame,
                                   vecCol: String, centroids: DataFrame,
                                   threshold: Double): DataFrame =
    graft.ops.Similarity.semanticDropAgainstIndexPlan(
      stream, vecCol, index.localCheckpoint(), centroids, threshold, None)

  /** Streaming semantic dedup against the PQ-CODED cell index
    * ([[graft.ops.Similarity.semanticCellIndexPq]]) — the corpus-scale
    * tier of [[dropSemanticAgainstCellIndex]]: the per-trigger static
    * side carries m int codes + one norm per corpus row instead of the
    * raw vector payload (~50× smaller at 768 dims, m=16), scored by
    * the codegen'd ADC lookup sum inside the anti-join condition.
    * Candidate-grain OVER-drop posture (the MinHash mirror's): every
    * index row carries its own sound score-error bound
    * ([[graft.ops.Similarity.semanticCellIndexPq]]), so every true
    * duplicate is dropped — screen recall provably 1, deltas included —
    * and near-threshold non-duplicates may over-drop; the batch tier
    * ([[graft.ops.Similarity.dropSemanticAgainstIndexPq]]) adds the
    * exact re-verify a stream cannot afford. `margin` is optional
    * extra slack (raising it only over-drops more). Zero state
    * operators; codebook/quantizer mismatch throws at scan time (cfg
    * stamp). */
  def dropSemanticAgainstCellIndexPq(stream: DataFrame, indexPq: DataFrame,
                                     vecCol: String, centroids: DataFrame,
                                     cb: Array[Double], m: Int,
                                     codesPerSub: Int, threshold: Double,
                                     margin: Double = 0.0): DataFrame =
    graft.ops.Similarity.semanticDropAgainstIndexPqPlan(
      stream, vecCol, indexPq.localCheckpoint(), centroids, cb, m,
      codesPerSub, threshold, margin, None)

  /** [[dropNearDupsAgainstHammingIndex]] via the map-only bloom plan
    * constant ([[graft.ops.Dedup.hammingBandKeyBloom]]) — the
    * corpus-scale path; posture and contract as
    * [[dropNearDupsAgainstIndexBloom]]. */
  def dropNearDupsAgainstHammingIndexBloom(stream: DataFrame,
                                           bloom: graft.ops.Dedup.BandKeyBloom,
                                           sigCol: String, sigBits: Int,
                                           maxHamming: Int): DataFrame = {
    val cfg = graft.ops.Dedup.hammingCfg(sigBits, maxHamming)
    require(bloom.cfg == cfg,
      s"band-key bloom built for '${bloom.cfg}' but queried with '$cfg' " +
        "— sigBits/maxHamming must match the index the bloom was built " +
        "from (a mismatch would silently drop NOTHING)")
    val contains = graft.ops.Dedup.bloomKeyFilter(stream.sparkSession, bloom)
    val hit = graft.ops.Dedup.hammingBandKeyCols(
        col(sigCol), sigBits, maxHamming)
      .map(contains)
      .reduce(_ || _)
    stream.filter(!hit)
  }
}
