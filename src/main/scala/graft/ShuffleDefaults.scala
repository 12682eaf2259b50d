package graft

/** Session-level performance defaults shared by every graft entry
  * point (Bench, Verify, tools, tests). Two knobs, both measured on
  * the r16 optimization pass; neither changes any query's rows.
  *
  * == Shuffle writer ==
  * Spark picks [[org.apache.spark.shuffle.sort.BypassMergeSortShuffleWriter]]
  * for any map-side-agg-free exchange with reduce count ≤
  * `spark.shuffle.sort.bypassMergeThreshold` (default 200): each map
  * task opens ONE TEMP FILE PER REDUCER and merges them afterwards —
  * M × R file creates per exchange. On filesystems where file
  * create/stat syscalls are expensive (containerized overlay mounts —
  * this sandbox measures ~1 ms per create), that is the dominant cost
  * of every small shuffle: the r16 narrow-layout spread added one
  * such exchange per corpus consumer and the sf0.1 bench cpu rose
  * 385 → 3815 s with the burn pinned in
  * `DiskBlockManager.createTempShuffleBlock` (jstack). With the
  * threshold at 0 the serialized sort writer runs instead: exactly one
  * data + one index file per map task at ANY reduce count (measured:
  * q_char_entropy 12.5 → 1.4 cpu-s at identical plans and results).
  * On a real cluster corpus shuffles have reduce counts ≫ 200, so
  * bypass never engaged there anyway — this only changes the small-R
  * regime, where the per-file syscalls are pure overhead.
  *
  * == Codegen cache ==
  * `spark.sql.codegen.cache.maxEntries` defaults to 100 compiled
  * classes; a 186-query catalog plus AQE's per-stage replans churns
  * that LRU and re-Janino-compiles identical sources all run long
  * (the sampled sf0.1 bench spent ~40 % of busy executor samples in
  * `CodeGenerator.compile`). 8192 entries hold the whole catalog's
  * generated classes for the life of the session (a few KB each).
  */
object ShuffleDefaults {
  val BypassMergeThreshold = "0"
  val CodegenCacheMaxEntries = "8192"
}
