package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped table semantics behind a small facade (SURVEY.md §1.2,
  * §7.4): snapshots, manifests, per-partition metrics and resumable check
  * state over Parquet + JSON. No Iceberg jar ships in this sandbox
  * (offline coursier), so the facade provides the same contract —
  * `snapshot id → immutable file set + stats`, atomic manifest append,
  * anti-joinable completed-partition registry — and a real Iceberg catalog
  * can be swapped in behind the same calls.
  *
  * Manifest layout under `root/`:
  *   manifest.jsonl — one JSON object per completed unit:
  *     {runId, unit, rows, wallMs, checkHash, snapshotId, ts}
  *   data/unit=<v>/ — parquet results for that unit (written before the
  *     manifest line, so a crash leaves at worst an orphan data dir — the
  *     manifest line is the commit point).
  */
object TableIO {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  final case class ManifestEntry(
      runId: String,
      unit: String,
      rows: Long,
      wallMs: Long,
      checkHash: String,
      snapshotId: String,
      ts: Long)

  def manifestPath(root: String): Path = Paths.get(root, "manifest.jsonl")

  def completedUnits(root: String, checkHash: String): Set[String] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala
      .filter(_.nonEmpty)
      .map(line => mapper.readValue(line, classOf[ManifestEntry]))
      .filter(_.checkHash == checkHash)
      .map(_.unit).toSet
  }

  def readManifest(root: String): Seq[ManifestEntry] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty)
      .map(line => mapper.readValue(line, classOf[ManifestEntry])).toSeq
  }

  /** Write one unit's result data then append its manifest line (the
    * commit point — atomic at the filesystem append level). */
  def commitUnit(root: String, entry: ManifestEntry, data: Map[String, DataFrame]): Unit = {
    data.foreach { case (name, df) =>
      df.write.mode("overwrite")
        .parquet(s"$root/data/$name/unit=${sanitize(entry.unit)}")
    }
    Files.createDirectories(Paths.get(root))
    Files.write(manifestPath(root),
      (mapper.writeValueAsString(entry) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Read back per-unit result data. When `onlyUnits` is given, reads ONLY
    * those unit directories (unsanitized unit values) — the resume path
    * passes the manifest-validated set so orphan data dirs from crashed or
    * incompatible (different checkHash) runs are never unioned in. */
  def readUnitData(spark: SparkSession, root: String, name: String,
      onlyUnits: Option[Set[String]] = None): Option[DataFrame] = {
    val dir = Paths.get(s"$root/data/$name")
    if (!Files.exists(dir)) None
    else {
      val present = Files.list(dir).iterator().asScala
        .filter(p => Files.isDirectory(p)).map(_.toString).toSeq
      val units = onlyUnits match {
        case None => present
        case Some(want) =>
          val wanted = want.map(u => s"unit=${sanitize(u)}")
          present.filter(p => wanted.contains(Paths.get(p).getFileName.toString))
      }
      if (units.isEmpty) None
      else Some(units.map(spark.read.parquet(_)).reduce(_ unionByName _))
    }
  }

  def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9_\\-.=]", "_")

  /** Content-address a check suite + code version: resumes only combine
    * state produced by the same logic (SURVEY.md §7.5 lineage). */
  def checkHash(checkDescriptions: Seq[String], codeVersion: String = BuildInfo.version): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(codeVersion.getBytes(StandardCharsets.UTF_8))
    checkDescriptions.sorted.foreach(d => md.update(d.getBytes(StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Snapshot a DataFrame as an immutable parquet set + snapshot manifest. */
  def writeSnapshot(df: DataFrame, root: String, snapshotId: String): Unit = {
    df.write.mode("overwrite").parquet(s"$root/snapshots/$snapshotId")
    val meta = Map(
      "snapshotId" -> snapshotId,
      "schema" -> df.schema.json,
      "ts" -> System.currentTimeMillis())
    Files.createDirectories(Paths.get(s"$root/snapshots"))
    Files.write(Paths.get(s"$root/snapshots/$snapshotId.json"),
      mapper.writeValueAsString(meta).getBytes(StandardCharsets.UTF_8))
  }
}

object BuildInfo { val version = "0.1.0" }
