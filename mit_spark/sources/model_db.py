"""Executor-local model artifact cache — parity with ModelDb::get
(/root/reference/crates/interface/src/models/mod.rs:16-48; download /
untar / sha256 at :69-149).

Semantics preserved exactly:
  * cache path  <root>/models/<kind>/<name>/<file>;
  * missing file        -> download (+extract if .tar.gz) -> verify sha256
                           -> on mismatch delete + retry ONCE -> verify or die;
  * present-but-corrupt -> same delete + retry-once path;
  * hash compare is case-insensitive hex of sha256 over the final file.

On a cluster every python worker calls ``get`` lazily inside the UDF; the
cache dir lives on executor-local disk (or the --archives unpack dir), so
each executor downloads at most once per model. A per-process lock guards
concurrent workers on one host. No network exists in this sandbox — tests
exercise the full path with file:// URLs, which is also the path a
pre-staged `--archives` deployment takes.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tarfile
import tempfile
import threading
import urllib.request

_LOCK = threading.Lock()


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


def _download_and_extract(url: str, file_path: str) -> None:
    with tempfile.NamedTemporaryFile(delete=False) as tmp:
        tmp_path = tmp.name
    try:
        with urllib.request.urlopen(url) as resp, open(tmp_path, "wb") as out:
            shutil.copyfileobj(resp, out)
        if url.endswith(".tar.gz"):
            extract_dir = os.path.dirname(file_path)
            with gzip.open(tmp_path, "rb") as gz, tarfile.open(fileobj=gz, mode="r|") as tar:
                tar.extractall(extract_dir, filter="data")
        else:
            shutil.move(tmp_path, file_path)
            tmp_path = None
    finally:
        if tmp_path and os.path.exists(tmp_path):
            os.unlink(tmp_path)


def get(kind: str, name: str, file: str, url: str, sha256: str) -> str:
    """Return the verified local path of a model artifact (ModelDb::get)."""
    file_path = os.path.join(root_path(), "models", kind, name, file)
    with _LOCK:
        os.makedirs(os.path.dirname(file_path), exist_ok=True)
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


# model registry constants mirrored from the reference
# (dbnet/src/lib.rs:43-50 registers model.onnx name+url+sha256)
DBNET_MODEL = {
    "kind": "detector",
    "name": "dbnet",
    "file": "model.onnx",
}
