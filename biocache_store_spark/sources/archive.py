"""Archive fetching: retrieve a data-resource archive and extract it for
the loaders.

Port of the reference's download surface (load/DataLoader.scala:373-404
`downloadArchive` + :440-470 `downloadStandardArchive`,
util/SFTPTools.scala:28-60): fetch a URL (skipping when not newer than the
last-checked date), then extract ZIP archives to a sibling directory or
gunzip single files, returning the directory the loaders should read.

Spark-first note: fetching is inherently a driver-side utility (one
archive per data resource, not per-record work), so this is plain Python;
the parallelism lives in the loaders that read the extracted files. URL
schemes: local paths and file:// are always available; http(s):// uses
urllib; sftp:// mirrors util/SFTPTools.scala:28-60 (`sftpLatestArchive`:
list the remote directory, take the newest file, skip when not newer than
last_checked) over an INJECTABLE transport — paramiko when importable,
otherwise the caller supplies an object with `list(dir)` and
`get(remote, local)`; with neither, sftp raises NotImplementedError
(the reference shells into JSch, which has no sandbox equivalent).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import os
import shutil
import urllib.error
import urllib.parse
import urllib.request
import zipfile


def _as_utc(dt: _dt.datetime) -> _dt.datetime:
    """Aware-UTC view of a datetime; naive values are taken as LOCAL time
    (what datetime.now()/fromtimestamp hand out) and converted."""
    return dt.astimezone(_dt.timezone.utc)


def _mtime(path: str) -> _dt.datetime:
    # timezone-aware UTC: these values feed If-Modified-Since comparisons
    return _dt.datetime.fromtimestamp(
        os.path.getmtime(path), tz=_dt.timezone.utc
    )


def _extract(archive_path: str) -> str:
    """ZIP -> sibling directory named after the archive (File.extractZip
    semantics); .gz -> gunzipped file; plain file kept as-is. Every shape
    returns a PER-RESOURCE directory (`<archive-stem>.d/` for gz/plain),
    never the shared dest_dir — a loader pointed at the returned path must
    see only this resource's files (DataLoader.scala:385-396)."""
    base, ext = os.path.splitext(archive_path)
    ext = ext.lower()
    if ext == ".zip":
        os.makedirs(base, exist_ok=True)
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(base)
        return base
    if ext == ".gz":
        out_dir = base + ".d"
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, os.path.basename(base))
        with gzip.open(archive_path, "rb") as src, open(out_path, "wb") as dst:
            shutil.copyfileobj(src, dst)
        # remove the gzip so the loader doesn't try to load it
        # (DataLoader.scala:391)
        os.remove(archive_path)
        return out_dir
    out_dir = archive_path + ".d"
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, os.path.basename(archive_path))
    shutil.move(archive_path, final)
    return out_dir


def fetch_archive(
    url: str,
    resource_uid: str,
    dest_dir: str,
    last_checked: _dt.datetime | None = None,
    sftp_transport=None,
) -> tuple[str | None, _dt.datetime | None]:
    """Fetch `url` into `dest_dir/<resource_uid>.<ext>` and extract.

    Returns (directory_for_loader, modified_date), or (None, None) when
    the source is not newer than `last_checked` (the reference's
    conditional-download behavior, DataLoader.scala:440-470).
    """
    parsed = urllib.parse.urlparse(url)
    scheme = parsed.scheme or "file"
    if scheme == "sftp":
        return _fetch_sftp(
            parsed, resource_uid, dest_dir, last_checked, sftp_transport
        )

    name = os.path.basename(parsed.path) or resource_uid
    # keep compound extensions (feed.csv.gz -> dr.csv.gz, so the gunzipped
    # file is dr.csv, not an extensionless blob)
    ext = name[name.index(".") :] if "." in name else ""
    target = os.path.join(dest_dir, resource_uid + ext.lower())
    os.makedirs(dest_dir, exist_ok=True)

    if scheme == "file" or (scheme not in ("http", "https") and os.path.exists(url)):
        src_path = parsed.path if scheme == "file" else url
        modified = _mtime(src_path)
        if last_checked is not None and modified <= _as_utc(last_checked):
            return None, None
        shutil.copyfile(src_path, target)
    elif scheme in ("http", "https"):
        req = urllib.request.Request(url)
        if last_checked is not None:
            # normalize to real UTC before claiming GMT — a naive local
            # datetime stamped 'GMT' is off by the local offset and makes
            # the server skip (or re-send) updates
            req.add_header(
                "If-Modified-Since",
                _as_utc(last_checked).strftime("%a, %d %b %Y %H:%M:%S GMT"),
            )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp, open(
                target, "wb"
            ) as out:
                shutil.copyfileobj(resp, out)
        except urllib.error.HTTPError as e:
            if e.code == 304:
                return None, None
            raise
        modified = _dt.datetime.now(tz=_dt.timezone.utc)
    else:
        raise ValueError(f"Unsupported archive URL: {url}")

    return _extract(target), modified

def _default_sftp_transport(parsed):
    """paramiko-backed transport when the library exists; None otherwise.
    Kept behind an import-try so air-gapped environments degrade to the
    injectable-transport contract instead of failing at import time."""
    try:
        import paramiko  # noqa: PLC0415
    except ImportError:
        return None

    class _ParamikoTransport:
        def __init__(self):
            client = paramiko.SSHClient()
            client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
            client.connect(
                parsed.hostname,
                port=parsed.port or 22,
                username=parsed.username,
                password=parsed.password,
            )
            self._client = client
            self._sftp = client.open_sftp()

        def list(self, directory):
            return [
                (
                    a.filename,
                    _dt.datetime.fromtimestamp(a.st_mtime, tz=_dt.timezone.utc),
                )
                for a in self._sftp.listdir_attr(directory)
            ]

        def get(self, remote, local):
            self._sftp.get(remote, local)

        def close(self):
            self._sftp.close()
            self._client.close()

    return _ParamikoTransport()


def _fetch_sftp(
    parsed,
    resource_uid: str,
    dest_dir: str,
    last_checked: _dt.datetime | None,
    transport,
) -> tuple[str | None, _dt.datetime | None]:
    """util/SFTPTools.scala:28-60 `sftpLatestArchive`: list the remote
    directory, pick the NEWEST file by modification time, skip when it is
    not strictly newer than `last_checked`, download and extract.

    `transport` contract (injectable for tests and air-gapped deployments,
    the same shape as multimodal.fetch_media's transport):
      * list(directory) -> [(filename, mtime: aware datetime), ...]
      * get(remote_path, local_path) -> None
    A path ending in a filename (has an extension) is fetched directly,
    mirroring the reference's single-file sftpPattern branch."""
    if transport is None:
        transport = _default_sftp_transport(parsed)
    if transport is None:
        raise NotImplementedError(
            "sftp:// archives need an SSH library (paramiko) or an injected "
            "transport (reference: util/SFTPTools.scala)"
        )
    try:
        remote_path = parsed.path or "/"
        base = os.path.basename(remote_path)
        if "." in base:  # direct file reference
            directory = os.path.dirname(remote_path) or "/"
            listing = dict(transport.list(directory))
            if base not in listing:
                # a typo'd explicit filename must NOT look like the routine
                # "not newer than last_checked" skip (the HTTP path raises
                # HTTPError(404) for the same mistake)
                raise FileNotFoundError(
                    f"sftp file not found: {directory}/{base}"
                )
            latest_name, latest_mtime = base, listing[base]
        else:
            entries = [
                (name, mtime)
                for name, mtime in transport.list(remote_path)
                if "." in name  # the reference lists `*.*`
            ]
            if not entries:
                return None, None
            latest_name, latest_mtime = max(entries, key=lambda e: e[1])
            remote_path = remote_path.rstrip("/")
        if last_checked is not None and latest_mtime <= _as_utc(last_checked):
            return None, None
        ext = latest_name[latest_name.index(".") :] if "." in latest_name else ""
        target = os.path.join(dest_dir, resource_uid + ext.lower())
        os.makedirs(dest_dir, exist_ok=True)
        remote_file = (
            remote_path
            if os.path.basename(remote_path) == latest_name
            else remote_path + "/" + latest_name
        )
        transport.get(remote_file, target)
        return _extract(target), latest_mtime
    finally:
        # the injectable contract has no mandatory close; honor one when
        # the transport provides it (the paramiko default does) so each
        # fetch releases its SSH session instead of leaking it
        close = getattr(transport, "close", None)
        if callable(close):
            close()
