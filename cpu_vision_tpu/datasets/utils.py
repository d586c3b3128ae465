"""Dataset infrastructure: integrity checks, archive extraction, download
(reference ``torchvision/datasets/utils.py:35-401``)."""

from __future__ import annotations

import gzip
import hashlib
import os
import tarfile
import urllib.request
import zipfile
from typing import Optional

__all__ = [
    "calculate_md5",
    "check_md5",
    "check_integrity",
    "extract_archive",
    "download_url",
    "download_and_extract_archive",
]


def calculate_md5(fpath: str, chunk_size: int = 1024 * 1024) -> str:
    md5 = hashlib.md5()
    with open(fpath, "rb") as f:
        while chunk := f.read(chunk_size):
            md5.update(chunk)
    return md5.hexdigest()


def check_md5(fpath: str, md5: str) -> bool:
    return md5 == calculate_md5(fpath)


def check_integrity(fpath: str, md5: Optional[str] = None) -> bool:
    """(reference ``check_integrity``, ``datasets/utils.py:60``)."""
    if not os.path.isfile(fpath):
        return False
    if md5 is None:
        return True
    return check_md5(fpath, md5)


def extract_archive(from_path: str, to_path: Optional[str] = None, remove_finished: bool = False) -> str:
    """Extract .zip/.tar(.gz|.xz)/.gz (reference ``extract_archive``,
    ``datasets/utils.py:317``)."""
    to_path = to_path or os.path.dirname(from_path)
    if from_path.endswith(".zip"):
        with zipfile.ZipFile(from_path) as z:
            z.extractall(to_path)
    elif from_path.endswith((".tar", ".tar.gz", ".tgz", ".tar.xz")):
        with tarfile.open(from_path) as t:
            t.extractall(to_path)
    elif from_path.endswith(".gz"):
        out = os.path.join(to_path, os.path.basename(from_path)[:-3])
        with gzip.open(from_path, "rb") as src, open(out, "wb") as dst:
            dst.write(src.read())
    else:
        raise ValueError(f"unsupported archive {from_path}")
    if remove_finished:
        os.remove(from_path)
    return to_path


def download_url(url: str, root: str, filename: Optional[str] = None, md5: Optional[str] = None) -> str:
    """Download with integrity check (reference ``download_url``,
    ``datasets/utils.py:90``).  In offline environments raises a clear error
    if the file isn't already present."""
    os.makedirs(root, exist_ok=True)
    fpath = os.path.join(root, filename or os.path.basename(url))
    if check_integrity(fpath, md5):
        return fpath
    try:
        urllib.request.urlretrieve(url, fpath)
    except Exception as e:
        raise RuntimeError(
            f"failed to download {url} (offline environment?) — place the file at {fpath} manually"
        ) from e
    if not check_integrity(fpath, md5):
        raise RuntimeError(f"downloaded file {fpath} failed its md5 check")
    return fpath


def download_and_extract_archive(
    url: str,
    download_root: str,
    extract_root: Optional[str] = None,
    filename: Optional[str] = None,
    md5: Optional[str] = None,
    remove_finished: bool = False,
) -> None:
    """(reference ``download_and_extract_archive``, ``datasets/utils.py:395``)."""
    fpath = download_url(url, download_root, filename, md5)
    extract_archive(fpath, extract_root or download_root, remove_finished)
