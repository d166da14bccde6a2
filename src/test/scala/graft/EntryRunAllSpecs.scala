package graft

/** The old EntrySpec "every query runs on sf0.001" monolith (828 s —
  * the second-longest pole of the test run after the unsplit CliSpec),
  * sharded so the forked groups can overlap it. Sharding is index mod
  * count over the SORTED query names: deterministic, and the union of
  * the four shards is every query by construction — a query added to
  * SparkEntry.queries lands in exactly one shard automatically.
  *
  * Each shard runs in its OWN forked JVM with its OWN java.io.tmpdir
  * (build.sbt), so the marker-gated on-disk state (statePath) and the
  * oracle aux dumps (auxRoot) are rebuilt per shard instead of shared —
  * that is what makes running them concurrently safe. */
abstract class EntryRunAllShard(shard: Int, of: Int) extends SparkTestBase {
  test(s"every query in shard ${shard + 1}/$of runs on sf0.001 and returns a schema") {
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .filter { case (_, i) => i % of == shard }
      .foreach { case (name, _) =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        assert(df.columns.nonEmpty, name)
        assert(df.count() >= 0, name)
      }
  }
}

class EntryRunAllSpecA extends EntryRunAllShard(0, 4)
class EntryRunAllSpecB extends EntryRunAllShard(1, 4)
class EntryRunAllSpecC extends EntryRunAllShard(2, 4)
class EntryRunAllSpecD extends EntryRunAllShard(3, 4)
