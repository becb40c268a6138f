"""File-transfer operations over a pluggable transport (SURVEY §2.1
S17-S21, §2.2 K16-K20) — the semantics of the reference's FTP module
(reference Wrap/FTP.pm) and local file handling (Wrap.pm:146-299,
634-670), transport-agnostic:

- `LocalTransport` — local/NFS paths (getLocalFiles, Wrap.pm:180-207)
  and the test double.
- `SFTPTransport` — paramiko-backed; the library is not present in this
  environment, so construction raises with instructions (the interface
  and every policy around it is real and tested via LocalTransport).
"""

from __future__ import annotations

import datetime as _dt
import fnmatch
import os
import re
import shutil
import zipfile
from dataclasses import dataclass


class Transport:
    """Minimal file-transfer interface the policies below are written
    against."""

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def isfile(self, path: str) -> bool:
        raise NotImplementedError

    def get(self, remote: str, local: str) -> None:
        raise NotImplementedError

    def put(self, local: str, remote: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError


class LocalTransport(Transport):
    def listdir(self, path):
        return sorted(os.listdir(path))

    def mtime(self, path):
        return os.stat(path).st_mtime

    def isfile(self, path):
        return os.path.isfile(path)

    def get(self, remote, local):
        shutil.copy2(remote, local)

    def put(self, local, remote):
        shutil.copy2(local, remote)

    def rename(self, src, dst):
        os.replace(src, dst)

    def delete(self, path):
        os.remove(path)


class SFTPTransport(Transport):
    """S18: SFTP binding over paramiko (reference Wrap/FTP.pm:258-315
    login semantics: host/user, optional password or private key file,
    port defaulting 22, known-hosts verification unless disabled).

    The connection opens lazily on first use and is reused; `close()`
    (or use as a context manager) tears it down. paramiko is optional
    in this environment — construction raises NotImplementedError when
    it is absent, and every policy in this module stays testable via
    LocalTransport."""

    def __init__(
        self,
        host: str,
        user: str,
        password: str | None = None,
        port: int = 22,
        private_key: str | None = None,
        known_hosts: str | None = None,
        timeout: float = 30.0,
    ):
        try:
            import paramiko  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "SFTP support requires the paramiko library, which is not "
                "available in this environment; use LocalTransport, or land "
                "remote files in object storage upstream (the 100-TB path)"
            ) from e
        self._paramiko = paramiko
        self._opts = dict(hostname=host, username=user, password=password, port=port,
                          key_filename=private_key, timeout=timeout)
        self._known_hosts = known_hosts
        self._client = None
        self._sftp = None

    def _conn(self):
        if self._sftp is None:
            client = self._paramiko.SSHClient()
            if self._known_hosts:
                client.load_host_keys(self._known_hosts)  # -hostkey parity (FTP.pm:284)
            else:
                client.set_missing_host_key_policy(self._paramiko.AutoAddPolicy())
            client.connect(**{k: v for k, v in self._opts.items() if v is not None})
            self._client = client
            self._sftp = client.open_sftp()
        return self._sftp

    def close(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = self._sftp = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def listdir(self, path):
        return sorted(self._conn().listdir(path))

    def mtime(self, path):
        return self._conn().stat(path).st_mtime

    def isfile(self, path):
        import stat as _stat

        try:
            return _stat.S_ISREG(self._conn().stat(path).st_mode)
        except FileNotFoundError:
            return False

    def get(self, remote, local):
        self._conn().get(remote, local)

    def put(self, local, remote):
        self._conn().put(local, remote)

    def rename(self, src, dst):
        sftp = self._conn()
        try:
            sftp.posix_rename(src, dst)  # atomic overwrite where the server supports it
        except OSError:
            try:
                sftp.remove(dst)
            except FileNotFoundError:
                pass
            sftp.rename(src, dst)

    def delete(self, path):
        self._conn().remove(path)


@dataclass
class FetchResult:
    fetched: list[str]
    missing: list[str]


def fetch_files(
    transport: Transport,
    remote_dir: str,
    local_dir: str,
    patterns: list[str],
    optional: set[str] | None = None,
) -> FetchResult:
    """S18/S21 getFiles + checkFiles: glob-expand each pattern remotely,
    fetch matches, classify misses as fatal vs optional."""
    os.makedirs(local_dir, exist_ok=True)
    names = transport.listdir(remote_dir)
    fetched, missing = [], []
    for pat in patterns:
        matches = fnmatch.filter(names, pat) if any(ch in pat for ch in "*?[") else (
            [pat] if pat in names else []
        )
        if not matches:
            missing.append(pat)
            continue
        for name in matches:
            dst = os.path.join(local_dir, name)
            transport.get(os.path.join(remote_dir, name), dst)
            fetched.append(dst)
    fatal = [m for m in missing if not (optional and m in optional)]
    if fatal:
        raise FileNotFoundError(f"required remote files missing: {fatal}")
    return FetchResult(fetched, missing)


def extract_archives(paths: list[str], out_dir: str) -> list[str]:
    """S19: unzip fetched archives; non-archives pass through unchanged
    (Spark reads .gz transparently but not zip members — extraction is
    the pragmatic path, Wrap.pm:285-299)."""
    out = []
    for p in paths:
        if zipfile.is_zipfile(p):
            with zipfile.ZipFile(p) as zf:
                for name in zf.namelist():
                    if name.endswith("/"):
                        continue
                    target = os.path.join(out_dir, os.path.basename(name))
                    with zf.open(name) as src, open(target, "wb") as dst:
                        shutil.copyfileobj(src, dst)
                    out.append(target)
        else:
            out.append(p)
    return out


def upload_file(
    transport: Transport,
    local_path: str,
    remote_dir: str,
    temp_prefix: str | None = "temp.",
) -> str:
    """K16 uploadFile: put via a temp name then atomically rename, so a
    remote monitor never sees a half-written file (Wrap/FTP.pm:118-167).
    Pass temp_prefix=None for a direct put."""
    name = os.path.basename(local_path)
    final = os.path.join(remote_dir, name)
    if temp_prefix:
        tmp = os.path.join(remote_dir, temp_prefix + name)
        transport.put(local_path, tmp)
        transport.rename(tmp, final)
    else:
        transport.put(local_path, final)
    return final


def archive_remote_files(
    transport: Transport,
    remote_dir: str,
    names: list[str],
    archive_dir: str | None = None,
    timestamp: _dt.datetime | None = None,
) -> None:
    """K18 archiveFiles: after success, timestamp-rename processed remote
    files into the archive dir (or delete when no archive is kept)."""
    ts = (timestamp or _dt.datetime.now()).strftime("%Y%m%d_%H%M%S")
    for name in names:
        src = os.path.join(remote_dir, name)
        if archive_dir:
            root, ext = os.path.splitext(name)
            transport.rename(src, os.path.join(archive_dir, f"{root}_{ts}{ext}"))
        else:
            transport.delete(src)


def remove_files_older_than(
    transport: Transport,
    remote_dir: str,
    days: int,
    now: _dt.datetime | None = None,
    simulate: bool = False,
) -> list[str]:
    """K19 removeFilesOlderX: retention sweep by mtime cutoff with
    simulate mode (Wrap/FTP.pm:20-56); only regular files are touched."""
    now = now or _dt.datetime.now()
    cutoff = (now - _dt.timedelta(days=days)).timestamp()
    removed = []
    for name in transport.listdir(remote_dir):
        p = os.path.join(remote_dir, name)
        if not transport.isfile(p):
            continue
        if transport.mtime(p) < cutoff:
            removed.append(name)
            if not simulate:
                transport.delete(p)
    return removed


_REDO_SUFFIX = re.compile(r"(_?\d{14}|_\d{8}(_\d{6})?)$")


def strip_redo_suffix(filename: str) -> str:
    """S20 redoFile: strip the history timestamp suffix so redo files
    re-acquire their original load name (Wrap.pm:146-177)."""
    root, ext = os.path.splitext(filename)
    return _REDO_SUFFIX.sub("", root) + ext


def move_to_history(
    paths: list[str],
    history_dir: str,
    timestamp: _dt.datetime | None = None,
) -> list[str]:
    """K20 moveFilesToHistory: processed local files become
    name_YYYYMMDD_HHMMSS.ext in the history dir; already-moved files are
    skipped (idempotent, cf. alreadyMovedOrDeleted, Wrap.pm:634-656)."""
    os.makedirs(history_dir, exist_ok=True)
    ts = (timestamp or _dt.datetime.now()).strftime("%Y%m%d_%H%M%S")
    moved = []
    for p in paths:
        if not os.path.exists(p):
            continue
        root, ext = os.path.splitext(os.path.basename(p))
        dst = os.path.join(history_dir, f"{root}_{ts}{ext}")
        os.replace(p, dst)
        moved.append(dst)
    return moved
