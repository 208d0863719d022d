package graft.jobs

/** Mail-content parity for the notification side-channel — the reference's
  * MailService subject/body formats and recipient routing
  * (reference: services/mail_service.py:27-99), kept separate from
  * transport so the formatting is unit-testable and the SMTP binding is a
  * one-line production Transport.
  *
  * Reference behaviors reproduced:
  *  - cron job reports: subject `[success|failed][stage][topic] decarb-etl
  *    cron job report`, bodies `All {topic} success.` / `[failed]: {msg}`
  *    (mail_service.py:94-99);
  *  - async-task failure goes to the DEVELOPER list with the task id and
  *    exception inline (mail_service.py:82-91);
  *  - ad-hoc `notify` keeps its topic verbatim as subject and sends HTML
  *    with an optional recipient override (mail_service.py:68-77);
  *  - the BYPASS_MAIL_SEND=1 kill-switch becomes [[Mail.NoopTransport]]
  *    (mail_service.py:32-34) — formatting still happens, nothing sends.
  *
  * Recipient lists are INJECTED (the reference hardcodes personal
  * addresses; a library must not), so routing is config, not code.
  */
object Mail {

  final case class Message(subject: String, body: String,
                           to: Seq[String], html: Boolean = false)

  trait Transport extends Serializable {
    def send(m: Message): Unit
  }

  /** BYPASS_MAIL_SEND=1: construct everything, deliver nothing. */
  object NoopTransport extends Transport {
    override def send(m: Message): Unit = ()
  }

  /** Test/audit transport: every message kept in order. */
  final class CollectingTransport extends Transport {
    val sent = scala.collection.mutable.ArrayBuffer.empty[Message]
    override def send(m: Message): Unit = sent += m
  }

  /** The routing + formatting layer (reference mail_service.py module
    * functions). `stage` is the deployment environment tag the reference
    * takes from FLASK_ENV. */
  final case class Router(stage: String,
                          operators: Seq[String],
                          developers: Seq[String],
                          transport: Transport) {

    private def report(kind: String, topic: String) =
      s"[$kind][$stage][$topic] decarb-etl cron job report"

    /** send_success_mail (mail_service.py:94-96). */
    def success(topic: String): Unit =
      transport.send(Message(report("success", topic),
        s"All $topic success.", operators))

    /** send_fail_mail (mail_service.py:98-99[sic, module tail]). */
    def failure(topic: String, message: String): Unit =
      transport.send(Message(report("failed", topic),
        s"[failed]: $message", operators))

    /** send_task_fail_mail — developer-routed async-task failure with the
      * task id inline (mail_service.py:82-91). */
    def taskFailure(topic: String, taskId: String, exc: String): Unit =
      transport.send(Message(report("failed", topic),
        s"[failed]: $topic task failed, Task $taskId, $exc", developers))

    /** the `notify` celery task: subject is the topic verbatim, HTML body,
      * optional recipient override (mail_service.py:68-77). */
    def notify(topic: String, htmlContent: String,
               toOverride: Option[Seq[String]] = None): Unit =
      transport.send(Message(topic, htmlContent,
        toOverride.getOrElse(operators), html = true))
  }

  /** Adapter: the DAG's [[Pipeline.Notifier]] seam, now with reference
    * mail-content parity — each job outcome formats exactly like the
    * reference's cron report mails. */
  final class MailNotifier(router: Router) extends Pipeline.Notifier {
    override def success(job: String): Unit = router.success(job)
    override def failure(job: String, error: Throwable): Unit =
      router.failure(job, String.valueOf(error.getMessage))
  }
}
