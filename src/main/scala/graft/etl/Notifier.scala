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
      // escape control chars too — an unescaped newline in a bucket/key
      // value would break the one-line-per-message NDJSON framing
      def esc(s: String): String = s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val json = message.toSeq.sortBy(_._1).map { case (k, v) =>
        val vj = v match {
          case s: String => "\"" + esc(s) + "\""
          case other     => String.valueOf(other)
        }
        "\"" + esc(k) + "\":" + vj
      }.mkString("{", ",", "}")
      Files.createDirectories(path.toAbsolutePath.getParent)
      Files.writeString(path, json + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}
