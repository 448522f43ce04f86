package graft.etl

import java.nio.file.{Files, Path, StandardOpenOption}

/**
 * Per-batch completion notification seam — the reference posts one SQS
 * message per written S3 object with {bucket, key, timestamp, date/time}
 * (reference: mysql_to_s3/extract.py:244-251). The container has no AWS
 * SDK, so the production SQS sender is left to deployment; the seam and
 * message shape are the contract.
 */
trait Notifier {
  /** One message per written batch object. */
  def add(message: Map[String, Any]): Unit
}

object Notifier {

  /** SQS-message JSON for a written batch (reference extract.py:246-251). */
  def batchMessage(bucket: String, key: String, now: java.time.Instant): Map[String, Any] = Map(
    "bucket" -> bucket,
    "key" -> key,
    "timestamp" -> now.getEpochSecond,
    "date/time" -> now.toString)

  val noop: Notifier = _ => ()

  /** Local NDJSON notifier: one JSON line appended per message — the SQS
    * seam made testable without a queue. */
  final class FileNotifier(path: Path) extends Notifier {
    override def add(message: Map[String, Any]): Unit = synchronized {
      val json = message.toSeq.sortBy(_._1).map { case (k, v) =>
        val vj = v match {
          case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case other     => String.valueOf(other)
        }
        "\"" + k + "\":" + vj
      }.mkString("{", ",", "}")
      Files.createDirectories(path.toAbsolutePath.getParent)
      Files.writeString(path, json + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}
