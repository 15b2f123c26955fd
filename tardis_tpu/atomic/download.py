"""Atomic-data download / cache management.

Counterpart of the reference's ``download_atom_data``
(/root/reference/tardis/io/atom_data/atom_web_download.py:23-60): resolve a
dataset name in the repo registry, place the ``.h5`` under the local data
directory, and verify its MD5.  Network access is attempted lazily via
urllib and failures produce an actionable error (this framework must also
work in air-gapped TPU pods, where the file is staged by hand).

Data dir resolution: ``$TARDIS_TPU_DATA_DIR`` if set, else
``~/.tardis-tpu/data``.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

# registry mirroring /root/reference/tardis/data/atomic_data_repo.yml
ATOMIC_DATA_REPO = {
    "default": "kurucz_cd23_chianti_H_He_latest",
    "kurucz_cd23_chianti_H_He_latest": {
        "url": (
            "https://media.githubusercontent.com/media/tardis-sn/"
            "tardis-regression-data/main/atom_data/"
            "kurucz_cd23_chianti_H_He_latest.h5"
        ),
        "mirrors": (),
        "md5": "16341df5d104b462be4c3e51b167a893",
    },
}


def get_data_dir() -> Path:
    data_dir = Path(
        os.environ.get(
            "TARDIS_TPU_DATA_DIR", Path.home() / ".tardis-tpu" / "data"
        )
    )
    data_dir.mkdir(parents=True, exist_ok=True)
    return data_dir


def md5_checksum(path, chunk=1 << 20) -> str:
    digest = hashlib.md5()
    with open(path, "rb") as f:
        while block := f.read(chunk):
            digest.update(block)
    return digest.hexdigest()


def download_atom_data(atomic_data_name: str | None = None,
                       force_download: bool = False) -> Path:
    """Fetch (or locate) a named atomic dataset; returns the local path.

    If the file already exists with a matching checksum it is reused.  On
    a machine without network egress, stage the file manually at the
    returned path; the error message spells this out.
    """
    if atomic_data_name is None:
        atomic_data_name = ATOMIC_DATA_REPO["default"]
    if atomic_data_name not in ATOMIC_DATA_REPO:
        raise ValueError(f"Atomic Data name {atomic_data_name} not known")
    entry = ATOMIC_DATA_REPO[atomic_data_name]
    dst = get_data_dir() / f"{atomic_data_name}.h5"

    if dst.exists() and not force_download:
        if entry.get("md5") and md5_checksum(dst) != entry["md5"]:
            # corrupt cache: treat as force_download (reference deletes and
            # re-fetches on mismatch) instead of silently returning bad data
            logger.warning(
                "%s exists but fails its MD5 check; re-downloading", dst
            )
        else:
            logger.info("Atomic data %s already cached at %s",
                        atomic_data_name, dst)
            return dst

    urls = (entry["url"], *entry.get("mirrors", ()))
    last_error = None
    for url in urls:
        try:
            logger.info("Downloading atomic data from %s to %s", url, dst)
            _download_from_url(url, dst)
            break
        except Exception as exc:  # noqa: BLE001 - report all failures below
            last_error = exc
            logger.warning("download from %s failed: %s", url, exc)
    else:
        raise RuntimeError(
            f"Could not download {atomic_data_name} "
            f"(last error: {last_error}). If this machine has no network "
            f"egress, copy the file manually to {dst} and re-run."
        )

    if entry.get("md5"):
        actual = md5_checksum(dst)
        if actual != entry["md5"]:
            dst.unlink(missing_ok=True)
            raise RuntimeError(
                f"MD5 mismatch for {atomic_data_name}: expected "
                f"{entry['md5']}, got {actual}"
            )
    return dst


def _download_from_url(url: str, dst: Path, timeout: float = 60.0):
    import urllib.request

    tmp = dst.with_suffix(".part")
    with urllib.request.urlopen(url, timeout=timeout) as resp, \
            open(tmp, "wb") as out:
        while block := resp.read(1 << 20):
            out.write(block)
    tmp.replace(dst)
