"""Executor-local model artifact cache — parity with ModelDb::get
(/root/reference/crates/interface/src/models/mod.rs:16-48; download /
untar / sha256 at :69-149).

Semantics preserved exactly:
  * cache path  <root>/models/<kind>/<name>/<file>;
  * missing file        -> download (+extract if .tar.gz) -> verify sha256
                           -> on mismatch delete + retry ONCE -> verify or die;
  * present-but-corrupt -> same delete + retry-once path;
  * hash compare is case-insensitive hex of sha256 over the final file.

Cluster-safety (beyond the reference, which is single-process): every python
worker PROCESS on a host may call ``get`` concurrently against the shared
cache dir, so installs must be atomic and cross-process exclusive:
  * all staging happens in a dot-temp path on the SAME filesystem as the
    final path and is promoted with os.replace (atomic rename — a reader
    never sees a partially-written artifact);
  * an fcntl.flock on a sidecar ``.lock`` file serializes processes (the
    threading.Lock only covers threads of one process);
  * the sha256 check runs inside the lock, so a concurrent writer can't
    swap the file mid-verification.
No network exists in this sandbox — tests exercise the full path with
file:// URLs, which is also the path a pre-staged `--archives` deployment
takes.
"""

from __future__ import annotations

import contextlib
import gzip
import hashlib
import os
import shutil
import tarfile
import tempfile
import threading
import urllib.request

_LOCK = threading.Lock()

try:
    import fcntl

    _HAVE_FCNTL = True
except ImportError:  # pragma: no cover — non-POSIX
    _HAVE_FCNTL = False


class ModelIntegrityError(RuntimeError):
    """Raised when the artifact hash still mismatches after the retry
    (the reference panics, models/mod.rs:35/43)."""


def root_path() -> str:
    return os.environ.get("MIT_SPARK_MODEL_ROOT", os.path.join(os.path.expanduser("~"), ".mit_spark"))


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _failure(path: str, expected: str) -> bool:
    if not os.path.exists(path):
        return True
    try:
        return _sha256(path) != expected.lower()
    except OSError:
        return True


@contextlib.contextmanager
def _file_lock(dir_path: str):
    """Inter-process exclusive lock on <dir>/.lock (fcntl.flock); released
    on exit even if the body raises. No-op where fcntl is unavailable."""
    if not _HAVE_FCNTL:
        yield
        return
    lock_path = os.path.join(dir_path, ".lock")
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _download_and_extract(url: str, file_path: str) -> None:
    """Fetch url and install file_path ATOMICALLY: all writes go to a
    dot-temp staging path in the destination directory (same filesystem, so
    os.replace is a true atomic rename, never a cross-device copy)."""
    dest_dir = os.path.dirname(file_path)
    staging = tempfile.mkdtemp(prefix=".staging-", dir=dest_dir)
    try:
        fetched = os.path.join(staging, "payload")
        with urllib.request.urlopen(url) as resp, open(fetched, "wb") as out:
            shutil.copyfileobj(resp, out)
        if url.endswith(".tar.gz"):
            # extract inside staging, then promote each member atomically
            with gzip.open(fetched, "rb") as gz, tarfile.open(fileobj=gz, mode="r|") as tar:
                tar.extractall(staging, filter="data")
            os.unlink(fetched)
            for entry in os.listdir(staging):
                src = os.path.join(staging, entry)
                dst = os.path.join(dest_dir, entry)
                # os.replace raises ENOTEMPTY when dst is an existing
                # non-empty directory (the corrupt-artifact retry path only
                # deletes file_path, so sibling extracted dirs survive);
                # we hold the dir flock, so clearing dst then renaming is
                # safe and leaves no stale members behind
                if os.path.isdir(dst) and not os.path.islink(dst):
                    shutil.rmtree(dst)
                os.replace(src, dst)
        else:
            os.replace(fetched, file_path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def get(kind: str, name: str, file: str, url: str, sha256: str) -> str:
    """Return the verified local path of a model artifact (ModelDb::get)."""
    file_path = os.path.join(root_path(), "models", kind, name, file)
    dir_path = os.path.dirname(file_path)
    with _LOCK:
        os.makedirs(dir_path, exist_ok=True)
        with _file_lock(dir_path):
            if not os.path.exists(file_path):
                _download_and_extract(url, file_path)
            if _failure(file_path, sha256):
                if os.path.exists(file_path):
                    os.unlink(file_path)
                _download_and_extract(url, file_path)
            if _failure(file_path, sha256):
                raise ModelIntegrityError(
                    f"sha256 mismatch for {kind}/{name}/{file} after retry (url={url})"
                )
    return file_path


def get_model(entry: dict) -> str:
    """Fetch + verify a registry-constant entry (see DBNET_MODEL et al)."""
    return get(entry["kind"], entry["name"], entry["file"], entry["url"], entry["sha256"])


# ---------------------------------------------------------------------------
# model registry constants mirrored from the reference. Only dbnet has a
# working detect; craft/ctd `detect` is todo!() in the reference, so for
# those ONLY the registry rows (url+hash) are portable — kept here so a
# deployment can pre-stage every artifact the reference knows about.

# dbnet/src/lib.rs:43-50 ("model" -> url + sha256 of model.onnx)
DBNET_MODEL = {
    "kind": "detector",
    "name": "dbnet",
    "file": "model.onnx",
    "url": "https://github.com/frederik-uni/manga-image-translator-rust/releases/download/dbnet-v1.0.0/model.onnx",
    "sha256": "7b348114b09015ce18373049c0ff90ce9a55fd3378cd33fd6209c80d1d04660e",
}

# interface/src/detectors/modules/craft.rs:19-33 (registry only; detect is todo!())
CRAFT_MODELS = {
    "refiner": {
        "kind": "detector",
        "name": "craft",
        "file": "craft_refiner_CTW1500.pth",
        "url": "https://github.com/zyddnys/manga-image-translator/releases/download/beta-0.3/craft_refiner_CTW1500.pth",
        "sha256": "f7000cd3e9c76f2231b62b32182212203f73c08dfaa12bb16ffb529948a01399",
    },
    "craft": {
        "kind": "detector",
        "name": "craft",
        "file": "craft_mlt_25k.pth",
        "url": "https://github.com/zyddnys/manga-image-translator/releases/download/beta-0.3/craft_mlt_25k.pth",
        "sha256": "4a5efbfb48b4081100544e75e1e2b57f8de3d84f213004b14b85fd4b3748db17",
    },
}

# interface/src/detectors/modules/ctd.rs:19-29 (registry only; detect is todo!())
CTD_MODELS = {
    "model-cuda": {
        "kind": "detector",
        "name": "ctd",
        "file": "comictextdetector.pt",
        "url": "https://github.com/zyddnys/manga-image-translator/releases/download/beta-0.3/comictextdetector.pt",
        "sha256": "1f90fa60aeeb1eb82e2ac1167a66bf139a8a61b8780acd351ead55268540cccb",
    },
    "model-cpu": {
        "kind": "detector",
        "name": "ctd",
        "file": "comictextdetector.pt.onnx",
        "url": "https://github.com/zyddnys/manga-image-translator/releases/download/beta-0.3/comictextdetector.pt.onnx",
        "sha256": "1a86ace74961413cbd650002e7bb4dcec4980ffa21b2f19b86933372071d718f",
    },
}
