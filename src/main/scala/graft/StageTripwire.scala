package graft

/** Bench-run tripwire for staged-artifact cold builds (r13 verdict,
  * "What's wrong" #4): [[BenchStages]]' consumer registry is a name
  * list humans must extend when a new query consumes a staged artifact
  * — the r13 sf10 window caught q44/q45's omission only because their
  * silent chain REBUILDS happened to cost 676/709 s. This makes the
  * failure mode self-diagnosing: [[Bench]] installs the current row's
  * name around every timed region; a staged builder that COLD-builds
  * while some other row is being timed fires a loud stderr marker and
  * a `stage_rebuild_in` line in the progress JSONL, so the artifact
  * itself says "this row's cost includes a mis-billed stage build".
  *
  * Outside a bench run nothing is installed and the calls are free.
  * Stage-name constants live here (not in [[BenchStages]]) so the
  * builders in `graft.llm` can report themselves without forcing the
  * registry object (which references them) to initialize first.
  */
object StageTripwire {

  val LshCandidates = "stage:lsh_candidates"
  val NearDupPairs = "stage:neardup_pairs"
  val DedupComponents = "stage:dedup_components"
  val KnnEdges = "stage:knn_edges"
  val Bm25Dl = "stage:bm25_dl"

  @volatile private var current: Option[String] = None
  @volatile private var sink: (String, String) => Unit = (_, _) => ()

  /** Bench wiring: called around each timed row / on bench start. */
  def setRow(name: String): Unit = current = Some(name)
  def clearRow(): Unit = current = None
  def install(onRebuild: (String, String) => Unit): Unit =
    sink = onRebuild

  /** Called by a staged builder's COLD path (the build lambda, not the
    * memo hit). Fires only when a bench row other than the stage's own
    * row is currently being timed. */
  def coldBuild(stage: String): Unit = current match {
    case Some(row) if row != stage =>
      System.err.println(s"[bench] STAGE REBUILD inside $row: $stage " +
        "cold-built outside its own bench row — this row's time " +
        "includes a mis-billed stage build (BenchStages registry gap?)")
      sink(row, stage)
    case _ => ()
  }
}
