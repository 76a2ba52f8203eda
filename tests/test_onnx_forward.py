"""N2 session wiring (base-util/src/onnx.rs:25-61).

Two layers: (1) `TestSessionWiring` injects a FAKE onnxruntime module and
pins the exact session configuration the adapter must apply — opt level 3,
parallel execution, intra=4/inter=2 threads, the reference's platform EP
order, the x/127.5-1 NHWC->NCHW normalization, the ["db","mask"] output
binding, and the sigmoid on the db head — so the wiring is TESTED in this
sandbox even though onnxruntime is absent. (2) The real-model smoke test
below still runs the moment the environment grows onnxruntime + onnx.
"""

import sys
import types

import numpy as np
import pytest


class _FakeSessionOptions:
    def __init__(self):
        self.graph_optimization_level = None
        self.execution_mode = None
        self.intra_op_num_threads = 0
        self.inter_op_num_threads = 0


class _FakeInferenceSession:
    created = []

    def __init__(self, model_path, sess_options=None, providers=None):
        self.model_path = model_path
        self.sess_options = sess_options
        self.providers = providers
        self.run_calls = []
        _FakeInferenceSession.created.append(self)

    def run(self, output_names, feeds):
        self.run_calls.append((output_names, {k: v.copy() for k, v in feeds.items()}))
        x = feeds["input"]  # (B, 3, H, W) float32
        db = x.mean(axis=1, keepdims=True)  # pre-sigmoid logits
        return [db, np.ones_like(db)]


def _fake_ort_module():
    m = types.ModuleType("onnxruntime")
    m.SessionOptions = _FakeSessionOptions
    m.GraphOptimizationLevel = types.SimpleNamespace(ORT_ENABLE_ALL="ENABLE_ALL")
    m.ExecutionMode = types.SimpleNamespace(ORT_PARALLEL="PARALLEL")
    m.InferenceSession = _FakeInferenceSession
    return m


class TestSessionWiring:
    @pytest.fixture(autouse=True)
    def fake_ort(self, monkeypatch):
        _FakeInferenceSession.created.clear()
        monkeypatch.setitem(sys.modules, "onnxruntime", _fake_ort_module())

    def test_session_options_match_reference(self):
        from mit_spark.operators.forward import make_onnx_forward

        make_onnx_forward("/models/dbnet.onnx")
        (sess,) = _FakeInferenceSession.created
        assert sess.model_path == "/models/dbnet.onnx"
        # base-util/src/onnx.rs:56-61
        assert sess.sess_options.graph_optimization_level == "ENABLE_ALL"
        assert sess.sess_options.execution_mode == "PARALLEL"
        assert sess.sess_options.intra_op_num_threads == 4
        assert sess.sess_options.inter_op_num_threads == 2

    def test_default_provider_order_linux(self, monkeypatch):
        from mit_spark.operators import forward

        monkeypatch.setattr(sys, "platform", "linux")
        # base-util/src/onnx.rs:25-36: TensorRT before CUDA, CPU fallback
        assert forward.default_providers() == [
            "TensorrtExecutionProvider",
            "CUDAExecutionProvider",
            "CPUExecutionProvider",
        ]
        forward.make_onnx_forward("/models/dbnet.onnx")
        (sess,) = _FakeInferenceSession.created
        assert sess.providers == forward.default_providers()

    def test_explicit_providers_passthrough(self):
        from mit_spark.operators.forward import make_onnx_forward

        make_onnx_forward("/m.onnx", providers=["CPUExecutionProvider"])
        (sess,) = _FakeInferenceSession.created
        assert sess.providers == ["CPUExecutionProvider"]

    def test_forward_normalization_and_sigmoid(self):
        """dbnet/src/lib.rs:85-101 seam: x/127.5-1, NHWC->NCHW, run
        ["db","mask"], sigmoid on the db head."""
        from mit_spark.operators.forward import make_onnx_forward

        fwd = make_onnx_forward("/m.onnx")
        batch = np.full((2, 8, 6, 3), 255, dtype=np.uint8)
        db, mask = fwd(batch)
        (sess,) = _FakeInferenceSession.created
        (output_names, feeds) = sess.run_calls[0]
        assert output_names == ["db", "mask"]
        x = feeds["input"]
        assert x.shape == (2, 3, 8, 6) and x.dtype == np.float32
        assert np.allclose(x, 1.0)  # 255/127.5 - 1
        assert db.shape == (2, 1, 8, 6)
        assert np.allclose(db, 1.0 / (1.0 + np.exp(-1.0)), atol=1e-6)


@pytest.fixture()
def toy_model(tmp_path):
    """input (B,3,H,W) -> db = ReduceMean over channels (B,1,H,W),
    mask = Identity(db) — two named outputs like the dbnet graph."""
    onnx = pytest.importorskip("onnx")
    from onnx import TensorProto, helper

    inp = helper.make_tensor_value_info("input", TensorProto.FLOAT, ["b", 3, "h", "w"])
    db = helper.make_tensor_value_info("db", TensorProto.FLOAT, ["b", 1, "h", "w"])
    mask = helper.make_tensor_value_info("mask", TensorProto.FLOAT, ["b", 1, "h", "w"])
    axes = helper.make_tensor("axes", TensorProto.INT64, [1], [1])
    n1 = helper.make_node("ReduceMean", ["input", "axes"], ["db"], keepdims=1)
    n2 = helper.make_node("Identity", ["db"], ["mask"])
    graph = helper.make_graph([n1, n2], "toy", [inp], [db, mask], [axes])
    model = helper.make_model(graph, opset_imports=[helper.make_opsetid("", 18)])
    p = tmp_path / "toy.onnx"
    onnx.save(model, str(p))
    return str(p)


def test_make_onnx_forward_runs_toy_model(toy_model):
    pytest.importorskip("onnxruntime")
    from mit_spark.operators.forward import make_onnx_forward

    fwd = make_onnx_forward(toy_model)
    batch = np.full((2, 8, 6, 3), 255, dtype=np.uint8)
    db, mask = fwd(batch)
    assert db.shape == (2, 1, 8, 6) and mask.shape == (2, 1, 8, 6)
    # input 255 -> normalized 1.0 -> mean 1.0 -> sigmoid(1.0)
    assert np.allclose(db, 1.0 / (1.0 + np.exp(-1.0)), atol=1e-6)
    assert np.allclose(mask, 1.0, atol=1e-6)
