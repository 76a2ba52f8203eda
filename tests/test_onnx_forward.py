"""N2 session wiring (base-util/src/onnx.rs:42-61): a skip-if-missing smoke
test so make_onnx_forward stops being dead code the moment the environment
grows onnxruntime. The toy model is built in-process with onnx if present;
otherwise the whole module skips."""

import numpy as np
import pytest

ort = pytest.importorskip("onnxruntime")
onnx = pytest.importorskip("onnx")


@pytest.fixture()
def toy_model(tmp_path):
    """input (B,3,H,W) -> db = ReduceMean over channels (B,1,H,W),
    mask = Identity(db) — two named outputs like the dbnet graph."""
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
    from mit_spark.operators.forward import make_onnx_forward

    fwd = make_onnx_forward(toy_model)
    batch = np.full((2, 8, 6, 3), 255, dtype=np.uint8)
    db, mask = fwd(batch)
    assert db.shape == (2, 1, 8, 6) and mask.shape == (2, 1, 8, 6)
    # input 255 -> normalized 1.0 -> mean 1.0 -> sigmoid(1.0)
    assert np.allclose(db, 1.0 / (1.0 + np.exp(-1.0)), atol=1e-6)
    assert np.allclose(mask, 1.0, atol=1e-6)
