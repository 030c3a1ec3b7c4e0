package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the stage-billing + segmented-window machinery (r13):
  * the bench artifact is only trustworthy if segments partition the
  * suite exactly, stage families never straddle a segment (an artifact
  * must build in exactly one JVM per window), and the registry's
  * consumer names track the real query registry (a renamed query would
  * silently lose its stage pre-build and re-inflate its row). */
class BenchStagesSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("every stage consumer is a registered query") {
    val known = names.toSet
    val ghosts = BenchStages.all.flatMap(_.consumers).filterNot(known)
    assert(ghosts.isEmpty, s"stage consumers not in the registry: $ghosts")
  }

  test("consumer sets are disjoint across stages (stage_of is a function)") {
    val all = BenchStages.all.flatMap(_.consumers)
    assert(all.size == all.distinct.size)
  }

  test("stage deps precede the stage in declaration order") {
    val pos = BenchStages.all.map(_.name).zipWithIndex.toMap
    BenchStages.all.foreach(s => s.deps.foreach(d =>
      assert(pos(d) < pos(s.name), s"${s.name} declared before dep $d")))
  }

  test("required() is dependency-closed and ordered") {
    def reqNames(qs: String*) =
      BenchStages.required(qs.toSet).map(_.name)
    assert(reqNames("q25_minhash_pairs") == Seq("stage:lsh_candidates"))
    assert(reqNames("q92_knn_graph") == Seq("stage:knn_edges"))
    assert(reqNames("q57_dedup_components") == Seq("stage:lsh_candidates",
      "stage:neardup_pairs", "stage:dedup_components"))
    assert(reqNames("q27_ngram_jaccard") == Seq("stage:lsh_candidates",
      "stage:neardup_pairs"))
    assert(reqNames("q01_pricing_summary").isEmpty)
  }

  test("segments partition the suite exactly, for every practical N") {
    for (n <- Seq(1, 2, 4, 8, 13)) {
      val segs = Bench.segmentNames(names, n)
      assert(segs.size == n)
      val flat = segs.flatten
      assert(flat.sorted == names,
        s"n=$n: segments are not an exact partition")
      // balance sanity: no segment more than ~3x the even share (stage
      // families are atomic, so perfect balance is not promised)
      val share = names.size.toDouble / n
      assert(segs.forall(_.size <= share * 3 + 1),
        s"n=$n: sizes ${segs.map(_.size)}")
    }
  }

  test("stage names match the tripwire constants the builders report") {
    // the builders self-report cold builds under StageTripwire's
    // constants; a registry row named anything else would never fire
    assert(BenchStages.all.map(_.name).toSet == Set(
      StageTripwire.LshCandidates, StageTripwire.NearDupPairs,
      StageTripwire.DedupComponents, StageTripwire.KnnEdges,
      StageTripwire.Bm25Dl))
  }

  test("registry covers every staged-artifact call site in the query files") {
    // the r13 sf10 window paid 1386 s for two consumers (q44/q45) that
    // reached a staged artifact INDIRECTLY and weren't listed — this
    // scan enumerates every call site of a staged builder (or of the
    // helpers that route to one: nearDupSurvivors / Curate.curate take
    // cacheKey) inside the query registries and asserts the enclosing
    // query is a registered consumer of SOME stage. Static twin of the
    // runtime StageTripwire.
    val helpers = Seq("stagedCandidatePairs", "stagedNearDupPairs",
      "stagedComponents", "stagedKnnEdges", "stagedDocLengths",
      "nearDupSurvivors", "Curate.curate")
    val files = Seq("src/main/scala/graft/llm/LlmQueries.scala",
      "src/main/scala/graft/Queries.scala",
      "src/main/scala/graft/osm/OsmQueries.scala")
      .map(java.nio.file.Paths.get(_))
    assume(files.forall(java.nio.file.Files.exists(_)),
      "source tree not available")
    val qName = """Q\("(q\d+[A-Za-z0-9_]*)"""".r
    val covered = BenchStages.stageOf.keySet
    val misses = files.flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f)
      var current = "?"
      (0 until lines.size).flatMap { i =>
        val line = lines.get(i)
        qName.findFirstMatchIn(line).foreach(m => current = m.group(1))
        if (helpers.exists(line.contains) && current != "?" &&
            !covered(current)) Some(s"$current (${f.getFileName}:${i + 1})")
        else None
      }
    }.distinct
    assert(misses.isEmpty,
      s"staged-builder call sites whose query is not a BenchStages " +
        s"consumer (registry gap => mis-billed bench row): $misses")
  }

  test("stage families never straddle a segment") {
    for (n <- Seq(2, 4, 8, 13)) {
      val segs = Bench.segmentNames(names, n)
      val segOf = segs.zipWithIndex
        .flatMap { case (s, i) => s.map(_ -> i) }.toMap
      BenchStages.all.foreach { st =>
        val where = st.consumers.toSeq.filter(segOf.contains)
          .map(segOf).distinct
        assert(where.size <= 1,
          s"n=$n: ${st.name} consumers span segments $where")
      }
      // the dependency CHAIN shares one segment too (pairs build reads
      // the candidates artifact — split chains would build candidates
      // twice)
      val chain = Seq("q25_minhash_pairs", "q27_ngram_jaccard",
        "q57_dedup_components").map(segOf)
      assert(chain.distinct.size == 1,
        s"n=$n: LSH chain split across segments $chain")
    }
  }
}
