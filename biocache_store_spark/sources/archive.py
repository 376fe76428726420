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
urllib; sftp:// requires an SSH library that is not part of this
environment and raises NotImplementedError (the reference shells into
JSch — SFTPTools.scala:70-120).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import os
import shutil
import urllib.parse
import urllib.request
import zipfile


def _mtime(path: str) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(os.path.getmtime(path))


def _extract(archive_path: str) -> str:
    """ZIP -> sibling directory named after the archive (File.extractZip
    semantics); .gz -> gunzipped sibling file, archive removed
    (DataLoader.scala:385-396); anything else -> containing directory."""
    base, ext = os.path.splitext(archive_path)
    ext = ext.lower()
    if ext == ".zip":
        os.makedirs(base, exist_ok=True)
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(base)
        return base
    if ext == ".gz":
        with gzip.open(archive_path, "rb") as src, open(base, "wb") as dst:
            shutil.copyfileobj(src, dst)
        # remove the gzip so the loader doesn't try to load it
        # (DataLoader.scala:391)
        os.remove(archive_path)
        return os.path.dirname(base)
    return os.path.dirname(archive_path)


def fetch_archive(
    url: str,
    resource_uid: str,
    dest_dir: str,
    last_checked: _dt.datetime | None = None,
) -> tuple[str | None, _dt.datetime | None]:
    """Fetch `url` into `dest_dir/<resource_uid>.<ext>` and extract.

    Returns (directory_for_loader, modified_date), or (None, None) when
    the source is not newer than `last_checked` (the reference's
    conditional-download behavior, DataLoader.scala:440-470).
    """
    parsed = urllib.parse.urlparse(url)
    scheme = parsed.scheme or "file"
    if scheme == "sftp":
        raise NotImplementedError(
            "sftp:// archives need an SSH library not present in this "
            "environment (reference: util/SFTPTools.scala)"
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
        if last_checked is not None and modified <= last_checked:
            return None, None
        shutil.copyfile(src_path, target)
    elif scheme in ("http", "https"):
        req = urllib.request.Request(url)
        if last_checked is not None:
            req.add_header(
                "If-Modified-Since",
                last_checked.strftime("%a, %d %b %Y %H:%M:%S GMT"),
            )
        try:
            with urllib.request.urlopen(req) as resp, open(target, "wb") as out:
                shutil.copyfileobj(resp, out)
        except urllib.error.HTTPError as e:  # type: ignore[attr-defined]
            if e.code == 304:
                return None, None
            raise
        modified = _dt.datetime.now()
    else:
        raise ValueError(f"Unsupported archive URL: {url}")

    return _extract(target), modified
