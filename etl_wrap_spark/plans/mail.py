"""Mail alerting adapter (SURVEY §2.11; reference Wrap/Common.pm:244-293).

The data plane reports failures as structured values (`RunReport` from
plans/runner.py, `CheckResult` from plans/logcheck.py); this module is
the thin transport that turns them into mails, mirroring the
reference's behaviors:

- **Error-mail throttling** (MailFilter, Common.pm:253-257): only the
  FIRST error mail per process run goes out — later errors in the same
  run are suppressed until `reset()` (the reference floods otherwise).
- **Subject context** (setErrSubject, Common.pm:260-263): subjects are
  "<env>: <subject>, <context>", with the environment prefix only
  outside production.
- **Success-after-retry mail** (Wrap.pm retry loop): when a run
  eventually succeeds after failed attempts, a one-line all-clear mail
  is sent so operators can stand down.

The SMTP call itself is injectable (`send_fn`) so tests — and
deployments that route alerts elsewhere — never need a live server.
"""

from __future__ import annotations

import smtplib
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from email.message import EmailMessage

from etl_wrap_spark.plans.logcheck import CheckResult
from etl_wrap_spark.plans.runner import RunReport


@dataclass
class MailConfig:
    """smtpServer/AuthUser/AuthPass/Timeout parity (Common.pm:281)."""

    server: str
    sender: str
    to: Sequence[str]
    port: int = 25
    user: str | None = None
    password: str | None = None
    timeout: float = 60.0
    subject: str = "ETL error"
    env: str = ""  # non-production environment tag; "" = production
    use_tls: bool = False


def smtp_send(cfg: MailConfig, msg: EmailMessage) -> None:
    """Default transport: one connection per mail (alert volume is
    throttled to ~1/run, so pooling buys nothing)."""
    with smtplib.SMTP(cfg.server, cfg.port, timeout=cfg.timeout) as s:
        if cfg.use_tls:
            s.starttls()
        if cfg.user:
            s.login(cfg.user, cfg.password or "")
        s.send_message(msg)


@dataclass
class Mailer:
    cfg: MailConfig
    send_fn: Callable[[MailConfig, EmailMessage], None] = smtp_send
    _error_sent: bool = field(default=False, init=False)

    def _subject(self, context: str) -> str:
        prefix = f"{self.cfg.env}: " if self.cfg.env else ""
        return f"{prefix}{self.cfg.subject}" + (f", {context}" if context else "")

    def _mail(self, context: str, body: str) -> EmailMessage:
        msg = EmailMessage()
        msg["From"] = self.cfg.sender
        msg["To"] = ", ".join(self.cfg.to)
        msg["Subject"] = self._subject(context)
        msg.set_content(body)
        return msg

    def reset(self) -> None:
        """New process run: arm the error throttle again."""
        self._error_sent = False

    def error(self, context: str, body: str) -> bool:
        """Send an error mail unless one already went out this run
        (MailFilter parity). Returns whether a mail was sent."""
        if self._error_sent:
            return False
        self._error_sent = True
        self.send_fn(self.cfg, self._mail(context, body))
        return True

    def report(self, report: RunReport, context: str = "") -> bool:
        """Mail a RunReport: failures raise the (throttled) error mail;
        success after earlier failed attempts sends the all-clear."""
        if not report.succeeded:
            body = f"run FAILED after {report.attempts} attempt(s):\n" + "\n".join(report.errors)
            return self.error(context, body)
        if report.attempts > 1:
            msg = self._mail(context, f"run succeeded on attempt {report.attempts} "
                                      f"(earlier errors:\n" + "\n".join(report.errors) + ")")
            self.send_fn(self.cfg, msg)
            return True
        return False

    def check_results(self, results: Sequence[CheckResult], context: str = "") -> bool:
        """Mail failed log-existence checks (checkLogExist.pl's alert),
        one summary mail for all failures."""
        failed = [r for r in results if not r.ok]
        if not failed:
            return False
        body = "log checks FAILED:\n" + "\n".join(f"- {r.job}: {r.reason}" for r in failed)
        return self.error(context or "logcheck", body)
