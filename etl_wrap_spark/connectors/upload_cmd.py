"""External uploader (SURVEY §2.2 K17): shell out to a configured
command, scrape its log output for error markers, and clean up the
files it consumed — the semantics of executeUploadCMD
(reference Wrap.pm:484-513), driver-side by nature.
"""

from __future__ import annotations

import os
import re
import subprocess
from dataclasses import dataclass


@dataclass
class UploadResult:
    returncode: int
    ok: bool
    log: str
    matched_errors: list[str]


def execute_upload_cmd(
    cmd: list[str],
    error_patterns: tuple[str, ...] = (r"(?i)\berror\b", r"(?i)\bfailed\b"),
    cleanup_files: list[str] | None = None,
    timeout: int = 600,
) -> UploadResult:
    """Run the upload command; success requires BOTH exit code 0 and no
    error-pattern hit in its output (the reference distrusts uploader
    exit codes and scrapes the log, Wrap.pm:497-505). Consumed files are
    removed only on success."""
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, check=False
    )
    log = proc.stdout + proc.stderr
    hits = [p for p in error_patterns if re.search(p, log)]
    ok = proc.returncode == 0 and not hits
    if ok and cleanup_files:
        for f in cleanup_files:
            if os.path.exists(f):
                os.remove(f)
    return UploadResult(proc.returncode, ok, log, hits)
