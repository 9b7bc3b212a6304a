"""ONNX writer validation: numerical parity, dynamic batch, and a
cross-check of the hand-rolled protobuf encoding against the official
protobuf implementation (protoc-compiled subset schema)."""
import os
import shutil
import subprocess
import sys
import tempfile

import jax
import numpy as np
import pytest

from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l
from r2l_tpu.onnx_writer import build_r2l_onnx, run_onnx

RTOL, ATOL = 1e-3, 1e-5  # reference check_onnx tolerances (main.py:879-882)


def _cfg(**kw):
    base = dict(input_dim=24, netwidth=32, netdepth=6,
                compute_dtype=jax.numpy.float32, precision="highest")
    base.update(kw)
    return R2LConfig(**base)


@pytest.mark.parametrize("cfg", [
    _cfg(),                                              # canonical shape
    _cfg(act="lrelu", inact="lrelu", res_scale=0.5),     # lrelu + scale
    _cfg(linear_tail=True, use_residual=False),
    _cfg(outact="relu", n_learnable=3),
    _cfg(body_arch="mlp"),
    # layerwise widths change the body output width, so the global
    # residual is shape-inconsistent (crashes in the reference too)
    _cfg(body_arch="mlp", layerwise_widths=(20, 24, 28, 16),
         use_residual=False),
], ids=["canonical", "lrelu_scale", "linear_tail", "outact_nl3",
        "mlp", "mlp_layerwise"])
def test_onnx_roundtrip_matches_jax(cfg):
    """Serialize -> decode -> numpy-execute must match the live forward
    at the reference tolerances, across the architecture option space."""
    params = init_r2l(jax.random.key(0), cfg)
    blob = build_r2l_onnx(params, cfg)
    for n in (1, 17, 64):  # exercise the dynamic batch axis
        x = np.asarray(jax.random.normal(jax.random.key(n),
                                         (n, cfg.input_dim)), np.float32)
        got = run_onnx(blob, x)
        want = np.asarray(apply_r2l(params, cfg, jax.numpy.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


# Subset of the public onnx.proto schema (onnx.ai, IR v7) used to
# cross-validate the wire encoding with the official protobuf parser.
ONNX_PROTO_SUBSET = """
syntax = "proto3";
package onnx_subset;

message AttributeProto {
  string name = 1;
  float f = 2;
  int64 i = 3;
  int64 type = 20;
}
message ValueInfoProto {
  string name = 1;
  TypeProto type = 2;
}
message NodeProto {
  repeated string input = 1;
  repeated string output = 2;
  string name = 3;
  string op_type = 4;
  repeated AttributeProto attribute = 5;
}
message ModelProto {
  int64 ir_version = 1;
  string producer_name = 2;
  string producer_version = 3;
  int64 model_version = 5;
  GraphProto graph = 7;
  repeated OperatorSetIdProto opset_import = 8;
}
message GraphProto {
  repeated NodeProto node = 1;
  string name = 2;
  repeated TensorProto initializer = 5;
  repeated ValueInfoProto input = 11;
  repeated ValueInfoProto output = 12;
}
message TensorProto {
  repeated int64 dims = 1;
  int64 data_type = 2;
  string name = 8;
  bytes raw_data = 9;
}
message TensorShapeProto {
  message Dimension {
    oneof value {
      int64 dim_value = 1;
      string dim_param = 2;
    }
  }
  repeated Dimension dim = 1;
}
message TypeProto {
  message Tensor {
    int64 elem_type = 1;
    TensorShapeProto shape = 2;
  }
  Tensor tensor_type = 1;
}
message OperatorSetIdProto {
  string domain = 1;
  int64 version = 2;
}
"""


def test_protoc_cross_validation():
    """Parse the emitted bytes with protoc-generated code (the official
    protobuf implementation) and verify every semantic detail of the
    model: versions, graph topology, initializer payloads, and the
    symbolic batch dimension."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    pytest.importorskip("google.protobuf")

    cfg = _cfg(res_scale=0.5)
    params = init_r2l(jax.random.key(0), cfg)
    blob = build_r2l_onnx(params, cfg)

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "onnx_subset.proto"), "w") as f:
            f.write(ONNX_PROTO_SUBSET)
        subprocess.run(["protoc", f"-I{d}", f"--python_out={d}",
                        "onnx_subset.proto"], check=True)
        sys.path.insert(0, d)
        try:
            import onnx_subset_pb2 as pb
            m = pb.ModelProto()
            consumed = m.ParseFromString(blob)
        finally:
            sys.path.remove(d)
            sys.modules.pop("onnx_subset_pb2", None)

    assert consumed == len(blob)
    assert m.ir_version == 7
    assert m.producer_name == "r2l_tpu"
    assert len(m.opset_import) == 1 and m.opset_import[0].version == 11

    g = m.graph
    assert g.name == "r2l"
    # graph I/O: dynamic batch as dim_param, static feature dims
    (inp,), (out,) = g.input, g.output
    assert inp.name == "input" and out.name == "rgb"
    in_dims = inp.type.tensor_type.shape.dim
    assert in_dims[0].dim_param == "batch"
    assert in_dims[1].dim_value == cfg.input_dim
    assert out.type.tensor_type.shape.dim[1].dim_value == 3

    # topology: head Gemm first, Sigmoid last, every node input resolved
    ops = [n.op_type for n in g.node]
    assert ops[0] == "Gemm" and ops[-1] == "Sigmoid"
    assert ops.count("Gemm") == 1 + cfg.num_blocks * cfg.n_learnable + 1
    assert ops.count("Mul") == cfg.num_blocks          # res_scale = 0.5
    assert ops.count("Add") == cfg.num_blocks + 1      # + global residual
    known = {t.name for t in g.initializer} | {"input"}
    for n in g.node:
        for i in n.input:
            assert i in known, f"dangling input {i} of {n.name}"
        known.update(n.output)
    assert g.node[-1].output[0] == "rgb"

    # initializer payloads round-trip bit-exactly
    head_w = next(t for t in g.initializer if t.name == "head_w")
    arr = np.frombuffer(head_w.raw_data, "<f4").reshape(tuple(head_w.dims))
    np.testing.assert_array_equal(arr,
                                  np.asarray(params["head"]["w"],
                                             np.float32))
    assert head_w.data_type == 1  # FLOAT
