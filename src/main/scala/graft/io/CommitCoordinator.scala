package graft.io

import scala.collection.concurrent.TrieMap

/**
 * External commit coordination for object stores WITHOUT an atomic
 * no-overwrite rename (raw S3 semantics: rename = copy + delete,
 * last-writer-wins). On such a store the manifest protocol's seq-keyed
 * rename stops being a CAS — two writers racing onto
 * `manifest-<N>.json` would both "succeed" and one commit would
 * silently vanish. This is precisely why Delta requires an external
 * LogStore (the DynamoDB `putIfAbsent` table) on raw S3; graft's
 * equivalent is this trait.
 *
 * Protocol (Delta's S3DynamoDBLogStore shape, public knowledge):
 *
 *  1. the writer STAGES the complete manifest JSON under a temp key
 *     (PUT-at-close: the object is invisible until fully written);
 *  2. it CLAIMS `(tableDir, seq)` via [[claim]] — an atomic
 *     putIfAbsent in a store that HAS conditional writes (DynamoDB's
 *     `attribute_not_exists`, a strongly-consistent lock service, or
 *     one coordinating process). The claim records the staged key;
 *  3. the WINNER copies its staged object onto `manifest-<seq>.json`
 *     (an overwrite here can only ever re-write identical bytes — see
 *     4 — so last-writer-wins is safe);
 *  4. a LOSER — or any later writer that finds a claim whose manifest
 *     key is still absent (the winner crashed between claim and
 *     publish) — FIXES UP the commit by copying the claim's staged
 *     key onto the manifest key itself. Recovery is idempotent by
 *     construction: every copier copies the SAME staged object, so
 *     concurrent fix-ups and a late winner all write identical bytes.
 *     The loser then rebases onto seq+1 exactly as on HDFS.
 *
 * Readers never need the coordinator: published manifests are
 * immutable, and a claimed-but-unpublished seq simply reads as "head
 * is still seq-1" until the next writer fixes it up.
 *
 * DEPLOYMENT CONTRACT: every writer of a table must share one
 * coordinator (the Delta LogStore rule). Register per URI scheme via
 * [[CommitCoordinator.register]]; schemes with no registration keep
 * the plain rename CAS (correct on HDFS and local file:// — their
 * renames refuse existing destinations). A production implementation
 * backs [[claim]] with a conditional-write table keyed by
 * `(tableDir, seq)`; [[InProcessCommitCoordinator]] is the in-tree
 * single-JVM implementation (tests, local pipelines).
 */
trait CommitCoordinator {

  /** Atomically claim the right to publish manifest `seq` under
    * `tableDir`, recording `stagedPath` (the fully-written temp key
    * holding the manifest bytes). Returns the WINNING record: ours
    * with `won = true` if this call created the claim, the prior
    * claimant's otherwise. */
  def claim(tableDir: String, seq: Long, stagedPath: String): CommitClaim
}

/** The outcome of a [[CommitCoordinator.claim]]: whether THIS caller
  * won, and the winner's staged manifest key (used by losers to fix up
  * a crashed winner's publish). */
final case class CommitClaim(won: Boolean, stagedPath: String)

object CommitCoordinator {
  private val bySchema = TrieMap.empty[String, CommitCoordinator]

  /** Route every manifest commit under URI scheme `scheme` through
    * `coordinator`. */
  def register(scheme: String, coordinator: CommitCoordinator): Unit =
    bySchema.put(scheme, coordinator)

  def unregister(scheme: String): Unit = bySchema.remove(scheme)

  private[io] def forScheme(scheme: String): Option[CommitCoordinator] =
    Option(scheme).flatMap(bySchema.get)
}

/** Single-process coordinator: the putIfAbsent table is an in-memory
  * map. Correct whenever all writers share one JVM (tests, a single
  * driver); multi-driver deployments need the conditional-write store
  * described on [[CommitCoordinator]]. */
final class InProcessCommitCoordinator extends CommitCoordinator {
  private val claims =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  override def claim(tableDir: String, seq: Long,
      stagedPath: String): CommitClaim = {
    val prior = claims.putIfAbsent((tableDir, seq), stagedPath)
    if (prior == null) CommitClaim(won = true, stagedPath)
    else CommitClaim(won = false, prior)
  }

  /** Test/inspection hook: the recorded claim for (tableDir, seq). */
  def claimFor(tableDir: String, seq: Long): Option[String] =
    Option(claims.get((tableDir, seq)))
}
