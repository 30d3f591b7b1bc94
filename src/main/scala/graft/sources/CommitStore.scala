package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** The storage primitives the commit protocol actually needs — the
  * SEAM between [[Publish]]'s staging→validate→promote logic and the
  * backend that makes its commit point durable.
  *
  * The protocol was designed against local-FS/HDFS semantics (atomic
  * rename); this trait names the five primitives it consumes so the
  * 100 TB object-store posture is a TYPED claim, not a prose aside.
  * Mapping for a rename-less store (S3-class, conditional requests):
  *
  *   - [[tryCreate]] (lock acquire) → conditional PUT of a lease
  *     object with `If-None-Match: *` — succeeds iff absent, exactly
  *     this primitive's contract;
  *   - [[ageMs]] + [[touch]] (stale check + heartbeat) → the lease
  *     object's user-metadata expiry re-PUT by the holder; a store
  *     with native TTLs replaces both;
  *   - [[moveExclusive]] (version-dir promotion, tombstone dance) →
  *     UNNECESSARY: version keys are unique and immutable, so staged
  *     objects are written directly under `v=N/` and the manifest
  *     write is the barrier — nothing is ever renamed. The local
  *     backend needs the rename only because a crashed stager leaves
  *     a partially-populated DIRECTORY a reader could list; unique
  *     immutable keys don't have that window (readers resolve the
  *     pointer first and never list unreferenced prefixes).
  *   - [[putAtomic]] (pointer flip) → conditional PUT of the pointer
  *     object with `If-Match: <etag read at transaction start>` —
  *     which SUBSUMES the CAS check in [[Publish.publishStagedIf]]:
  *     the compare and the flip become one store round-trip, and the
  *     whole lock above becomes an optimization (contention backoff)
  *     rather than a correctness requirement.
  *   - [[get]] (pointer resolve) → GET of the pointer object.
  *
  * The default backend is [[LocalCommitStore]] (java.nio, byte-for-
  * byte the historical behavior). `Publish.store` is the injection
  * point; PublishSpec swaps in a delegating store to prove every
  * commit-path operation routes through the seam.
  */
private[graft] trait CommitStore {

  /** Create `path` iff absent (empty content). False when it already
    * exists. Object store: conditional PUT `If-None-Match: *`. */
  def tryCreate(path: Path): Boolean

  /** Milliseconds since `path` was last written/touched; -1 when
    * absent. Object store: lease expiry metadata. */
  def ageMs(path: Path): Long

  /** Refresh `path`'s modification time (heartbeat). Throws
    * NoSuchFileException if it vanished. */
  def touch(path: Path): Unit

  /** Delete `path` if present. */
  def deleteIfExists(path: Path): Unit

  /** Atomically move `src` to `dst`, failing if `dst` exists.
    * Object store: not needed — unique immutable keys. */
  def moveExclusive(src: Path, dst: Path): Unit

  /** Atomically replace `path`'s content with `value` — THE commit
    * point. Object store: conditional PUT `If-Match`. */
  def putAtomic(path: Path, value: String): Unit

  /** Read `path`'s content, None when absent. */
  def get(path: Path): Option[String]
}

/** The java.nio backend — the exact primitives the protocol has
  * always used on local FS (and, unchanged, on HDFS-like mounts:
  * createFile, mtime, atomic rename). */
private[graft] object LocalCommitStore extends CommitStore {

  override def tryCreate(path: Path): Boolean =
    try { Files.createFile(path); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def ageMs(path: Path): Long =
    try System.currentTimeMillis() - Files.getLastModifiedTime(path).toMillis
    catch { case _: java.nio.file.NoSuchFileException => -1L }

  override def touch(path: Path): Unit =
    Files.setLastModifiedTime(path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())): Unit

  override def deleteIfExists(path: Path): Unit =
    Files.deleteIfExists(path): Unit

  override def moveExclusive(src: Path, dst: Path): Unit =
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE): Unit

  override def putAtomic(path: Path, value: String): Unit = {
    val tmp = path.resolveSibling(s".${path.getFileName}.tmp")
    Files.write(tmp, value.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  override def get(path: Path): Option[String] =
    if (Files.exists(path))
      Some(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    else None
}
