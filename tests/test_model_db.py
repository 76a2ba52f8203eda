"""ModelDb parity (models/mod.rs:16-48 + its own test strategy at
:151-213: cache hit, corrupt-redownload, hash-failure death) using
file:// URLs — no network, same code path as a pre-staged deployment."""

import hashlib
import tarfile

import pytest

from mit_spark.sources import model_db


@pytest.fixture()
def model_root(tmp_path, monkeypatch):
    monkeypatch.setenv("MIT_SPARK_MODEL_ROOT", str(tmp_path / "cache"))
    return tmp_path


def _make_artifact(tmp_path, data=b"onnx-bytes-v1"):
    src = tmp_path / "remote" / "model.onnx"
    src.parent.mkdir(exist_ok=True)
    src.write_bytes(data)
    return f"file://{src}", hashlib.sha256(data).hexdigest(), src


def test_download_verify_and_cache_hit(model_root):
    url, sha, src = _make_artifact(model_root)
    p1 = model_db.get("detector", "dbnet", "model.onnx", url, sha)
    assert open(p1, "rb").read() == b"onnx-bytes-v1"
    # cache hit: removing the remote must not matter
    src.unlink()
    p2 = model_db.get("detector", "dbnet", "model.onnx", url, sha)
    assert p2 == p1


def test_corrupt_cache_redownloads(model_root):
    url, sha, _ = _make_artifact(model_root)
    p = model_db.get("detector", "dbnet", "model.onnx", url, sha)
    with open(p, "wb") as f:
        f.write(b"corrupted")
    p2 = model_db.get("detector", "dbnet", "model.onnx", url, sha)
    assert open(p2, "rb").read() == b"onnx-bytes-v1"


def test_hash_mismatch_raises_after_retry(model_root):
    url, _, _ = _make_artifact(model_root)
    with pytest.raises(model_db.ModelIntegrityError):
        model_db.get("detector", "dbnet", "model.onnx", url, "0" * 64)


def test_tar_gz_extraction(model_root, tmp_path):
    inner = tmp_path / "model.onnx"
    inner.write_bytes(b"tarred-model")
    tar_path = tmp_path / "remote.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(inner, arcname="model.onnx")
    # url ends with .tar.gz -> the extract branch unpacks into the cache dir
    url = f"file://{tar_path}"
    sha = hashlib.sha256(b"tarred-model").hexdigest()
    p = model_db.get("detector", "dbnet", "model.onnx", url, sha)
    assert open(p, "rb").read() == b"tarred-model"
