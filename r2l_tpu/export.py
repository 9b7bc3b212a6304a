"""Model export + numerical parity check.

The reference exports to ONNX (opset 11, dynamic batch axis) and verifies
with onnxruntime at ``rtol=1e-3, atol=1e-5`` (`/root/reference/main.py:
831-885, 1106-1122`). The TPU-native analog is ``jax.export``: a serialized
StableHLO artifact with a symbolic batch dimension, reloadable by any JAX
process (and convertible to TF SavedModel / TFLite downstream). The parity
check deserializes the artifact and asserts the same tolerances as the
reference against the live forward pass.

``export_onnx`` additionally emits a REAL ``.onnx`` for reference-world
consumers — via torch's exporter when the ``onnx`` package is importable
(reference provenance), otherwise via the in-repo spec-level serializer
(``onnx_writer.py``) — verified with onnxruntime at the reference
tolerances when it exists, else with the in-repo ONNX evaluator.
``export_savedmodel`` emits a TF SavedModel via ``jax2tf`` (symbolic
batch) when TensorFlow is importable — the standard bridge to the wider
ONNX toolchain (tf2onnx) and TFLite.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .models.r2l import R2LConfig, apply_r2l

RTOL, ATOL = 1e-3, 1e-5  # reference tolerances (`main.py:879-882`)


def export_r2l(params: dict, cfg: R2LConfig, out_dir: str,
               sample_batch: int = 4096) -> str:
    """Serialize the R2L forward to ``<out_dir>/r2l.stablehlo``.

    The batch axis is exported symbolically, matching the reference's
    dynamic-batch ONNX axis (`main.py:1111-1115`).

    The artifact is always the FULL-PRECISION forward (params are stored
    f32; ``compute_dtype`` only selects the on-TPU activation dtype):
    the reference likewise exports its f32 torch model, and the
    rtol=1e-3/atol=1e-5 parity check below is meaningless for a bf16
    graph, whose two compilations legitimately differ by ~bf16 eps.
    """
    import dataclasses

    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                              precision="highest")

    def forward(x):
        return apply_r2l(params, cfg, x)

    batch = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((batch, cfg.input_dim), jnp.float32)
    exported = jexport.export(jax.jit(forward))(spec)
    blob = exported.serialize()

    path = os.path.join(out_dir, "r2l.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)

    check_export(path, params, cfg, sample_batch)
    return path


def check_export(path: str, params: dict, cfg: R2LConfig,
                 sample_batch: int = 4096) -> None:
    """Reload the artifact and assert parity (reference ``check_onnx``).
    Compares against the f32 forward — the graph ``export_r2l`` writes."""
    import dataclasses

    from jax import export as jexport

    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                              precision="highest")

    with open(path, "rb") as f:
        restored = jexport.deserialize(f.read())

    x = jax.random.normal(jax.random.key(0),
                          (sample_batch, cfg.input_dim), jnp.float32)
    got = np.asarray(restored.call(x))
    # jit: eager apply_r2l would dispatch the 88-layer net op-by-op
    # (~30 ms/call through this image's device tunnel)
    want = np.asarray(jax.jit(
        lambda x: apply_r2l(params, cfg, x))(x))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def build_torch_r2l(params: dict, cfg: R2LConfig):
    """Rebuild the R2L forward as a torch module over the SAME weights
    (via ``checkpoint.params_to_torch_r2l`` layout rules: torch Linears
    are [out, in]). Used by ``export_onnx`` — the reference exports its
    torch ``NeRF_v3_2`` (`main.py:1106-1122`); this module reproduces
    that forward (`model/nerf_raybased.py:539-544`) from our pytree so
    the emitted graph is the reference-compatible one."""
    import torch

    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)

    def lin(w, b):
        m = torch.nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(np.ascontiguousarray(w.T)))
            m.bias.copy_(torch.from_numpy(np.array(b, copy=True)))
        return m

    def act(name):
        return {"relu": torch.nn.ReLU(), "lrelu": torch.nn.LeakyReLU(0.01),
                "none": None}[name.lower()]

    class TorchR2L(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.head = lin(host["head"]["w"], host["head"]["b"])
            self.blocks = torch.nn.ModuleList()
            body = host["body"]
            if cfg.body_arch == "resmlp":
                nb, nl = body["w"].shape[0], body["w"].shape[1]
                for i in range(nb):
                    self.blocks.append(torch.nn.ModuleList(
                        [lin(body["w"][i, j], body["b"][i, j])
                         for j in range(nl)]))
            else:
                for layer in body:
                    self.blocks.append(torch.nn.ModuleList(
                        [lin(layer["w"], layer["b"])]))
            self.tail = lin(host["tail"]["w"], host["tail"]["b"])
            self.act = act(cfg.act)
            self.inact = act(cfg.inact)
            self.outact = act(cfg.outact)

        def forward(self, x):
            h = self.head(x)
            if self.act is not None:
                h = self.act(h)
            out = h
            if cfg.body_arch == "resmlp":
                for blk in self.blocks:
                    b_in = out
                    b = out
                    for j, m in enumerate(blk):
                        b = m(b)
                        if j < len(blk) - 1 and self.inact is not None:
                            b = self.inact(b)
                    out = b * cfg.res_scale + b_in
                    if self.outact is not None:
                        out = self.outact(out)
            else:
                for blk in self.blocks:
                    out = blk[0](out)
                    if self.act is not None:
                        out = self.act(out)
            if cfg.use_residual:
                out = out + h
            out = self.tail(out)
            if not cfg.linear_tail:
                out = torch.sigmoid(out)
            return out

    return TorchR2L().eval()


def export_onnx(params: dict, cfg: R2LConfig, out_dir: str,
                sample_batch: int = 4096, log=print) -> str | None:
    """Emit ``<out_dir>/r2l.onnx`` (opset 11, dynamic batch axis — the
    reference's ``save_onnx``, `main.py:831-853`): via torch's ONNX
    serializer when available, else the dependency-free in-repo writer
    (`onnx_writer.py`), so an artifact is always produced. Verified with
    onnxruntime at the reference tolerances (``check_onnx``,
    `main.py:857-885`) when importable, else with the in-repo evaluator.
    Returns the path.
    """
    import dataclasses

    try:
        import torch
    except ImportError:
        torch = None  # the native writer below needs no torch

    cfg32 = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                                precision="highest")
    x_np = np.asarray(jax.random.normal(
        jax.random.key(0), (min(sample_batch, 256), cfg32.input_dim),
        jnp.float32))
    want = np.asarray(jax.jit(lambda v: apply_r2l(params, cfg32, v))(
        jnp.asarray(x_np)))

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "r2l.onnx")
    provenance = None
    if torch is not None:
        module = build_torch_r2l(params, cfg32)
        # The torch rebuild must match the jax forward BEFORE serializing
        # — a conversion bug would otherwise ship silently.
        with torch.no_grad():
            got = module(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
        dummy = torch.zeros(1, cfg32.input_dim)
        try:
            torch.onnx.export(module, (dummy,), path, opset_version=11,
                              input_names=["input"], output_names=["rgb"],
                              dynamic_axes={"input": {0: "batch"},
                                            "rgb": {0: "batch"}},
                              dynamo=False)
            provenance = "torch exporter"
        except Exception:  # torch raises OnnxExporterError w/o `onnx`
            pass
    if provenance is None:
        # The in-repo spec-level serializer (onnx_writer.py): same graph
        # semantics (Gemm/Relu/Add/Sigmoid, dynamic batch, opset 11),
        # no dependency on torch or the onnx package.
        from .onnx_writer import build_r2l_onnx
        with open(path, "wb") as f:
            f.write(build_r2l_onnx(params, cfg32))
        provenance = ("native writer (torch not importable)"
                      if torch is None else
                      "native writer (torch exporter needs the 'onnx' "
                      "package, not bundled here)")

    try:
        import onnxruntime as ort
    except ImportError:
        # In-repo evaluator check: decode the serialized file and run it
        # with numpy — the reference's check_onnx (`main.py:857-885`)
        # without onnxruntime. Only our own artifacts are guaranteed
        # decodable (torch may emit ops the evaluator lacks).
        from .onnx_writer import run_onnx
        with open(path, "rb") as f:
            blob = f.read()
        try:
            got_onnx = run_onnx(blob, x_np)
        except NotImplementedError as e:
            log(f"[export] wrote {path} via {provenance}; onnxruntime "
                f"not installed and the in-repo evaluator cannot replay "
                f"this graph ({e}) — install onnxruntime for the runtime "
                f"parity check.")
            return path
        np.testing.assert_allclose(got_onnx, want, rtol=RTOL, atol=ATOL)
        log(f"[export] wrote {path} via {provenance} (in-repo ONNX "
            f"evaluator parity check passed at rtol={RTOL}/atol={ATOL}; "
            f"install onnxruntime to also run the reference's runtime "
            f"check, `main.py:857-885`)")
        return path

    sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
    ort_out = sess.run(["rgb"], {"input": x_np})[0]
    np.testing.assert_allclose(ort_out, want, rtol=RTOL, atol=ATOL)
    log(f"[export] wrote {path} via {provenance} (onnxruntime parity "
        f"check passed)")
    return path


def export_savedmodel(params: dict, cfg: R2LConfig, out_dir: str,
                      sample_batch: int = 256, log=print) -> str | None:
    """Emit ``<out_dir>/saved_model/`` via ``jax2tf`` with a symbolic
    batch dimension, reload it, and assert parity at the reference
    tolerances. A TF SavedModel is the standard bridge from JAX to the
    wider interop toolchain (tf2onnx -> .onnx, TFLite) — the ecosystem
    role the reference's ONNX file plays (`main.py:831-885`). Returns
    the path, or None with a loud skip when TF is not importable."""
    import dataclasses

    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:
        log(f"[export] SavedModel SKIPPED — TensorFlow not importable "
            f"({e}). The StableHLO + ONNX artifacts are unaffected.")
        return None

    cfg32 = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                                precision="highest")
    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)

    # Pin the StableHLO inside the SavedModel to CPU + TPU: without this,
    # exporting FROM a TPU host bakes in platforms=[TPU] and the TF CPU
    # runtime (tf2onnx, TFLite, the parity check below) refuses to replay
    # it ("current platform CPU is not among the platforms required").
    tf_fwd = jax2tf.convert(
        lambda x: apply_r2l(host, cfg32, x),
        polymorphic_shapes=[f"(b, {cfg32.input_dim})"],
        native_serialization_platforms=("cpu", "tpu"))
    module = tf.Module()
    module.f = tf.function(
        tf_fwd, autograph=False,
        input_signature=[tf.TensorSpec([None, cfg32.input_dim],
                                       tf.float32)])
    path = os.path.join(out_dir, "saved_model")
    tf.saved_model.save(module, path)

    restored = tf.saved_model.load(path)
    x = np.asarray(jax.random.normal(
        jax.random.key(0), (sample_batch, cfg32.input_dim), jnp.float32))
    got = restored.f(x).numpy()
    want = np.asarray(jax.jit(
        lambda v: apply_r2l(params, cfg32, v))(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    log(f"[export] wrote {path} (SavedModel reload parity check passed)")
    return path


def _build_tf_forward(params: dict, cfg: R2LConfig):
    """The R2L forward as PLAIN TensorFlow ops over captured constants
    (no jax2tf/StableHLO wrapper): MatMul/BiasAdd/Relu/Sigmoid only, so
    the graph lowers to TFLite BUILTIN ops (XNNPACK-ready). Mirrors
    ``apply_r2l`` / reference `model/nerf_raybased.py:539-544`."""
    import tensorflow as tf

    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    acts = {"relu": tf.nn.relu,
            "lrelu": lambda v: tf.nn.leaky_relu(v, alpha=0.01),
            "none": None}
    act, inact, outact = (acts[cfg.act.lower()], acts[cfg.inact.lower()],
                          acts[cfg.outact.lower()])

    def fwd(x):
        h = x @ tf.constant(host["head"]["w"]) + tf.constant(
            host["head"]["b"])
        if act is not None:
            h = act(h)
        out = h
        if cfg.body_arch == "resmlp":
            bw, bb = host["body"]["w"], host["body"]["b"]
            for i in range(bw.shape[0]):
                b_in = out
                b = out
                for j in range(bw.shape[1]):
                    b = b @ tf.constant(bw[i, j]) + tf.constant(bb[i, j])
                    if j < bw.shape[1] - 1 and inact is not None:
                        b = inact(b)
                out = b * cfg.res_scale + b_in
                if outact is not None:
                    out = outact(out)
        else:
            for layer in host["body"]:
                out = out @ tf.constant(layer["w"]) + tf.constant(
                    layer["b"])
                if act is not None:
                    out = act(out)
        if cfg.use_residual:
            out = out + h
        out = out @ tf.constant(host["tail"]["w"]) + tf.constant(
            host["tail"]["b"])
        if not cfg.linear_tail:
            out = tf.sigmoid(out)
        return out

    return tf.function(
        fwd, autograph=False,
        input_signature=[tf.TensorSpec([None, cfg.input_dim], tf.float32)])


def export_tflite(params: dict, cfg: R2LConfig, out_dir: str,
                  sample_batch: int = 256, log=print) -> str | None:
    """Emit ``<out_dir>/r2l.tflite`` — the on-device deployment artifact
    (R2L's published follow-up MobileR2L runs the distilled student on
    phones; the reference repo itself stops at ONNX, `main.py:831-853`,
    so this EXCEEDS its export surface). Builtin-ops-only graph
    (`_build_tf_forward`), dynamic batch, verified against the jax
    forward with the TFLite interpreter at the reference tolerances.
    Returns the path, or None with a loud skip when TF is missing."""
    import dataclasses

    try:
        import tensorflow as tf
    except ImportError as e:
        log(f"[export] TFLite SKIPPED — TensorFlow not importable ({e}). "
            f"The StableHLO + ONNX artifacts are unaffected.")
        return None

    cfg32 = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                                precision="highest")
    fn = _build_tf_forward(params, cfg32)
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [fn.get_concrete_function()])
    blob = converter.convert()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "r2l.tflite")
    with open(path, "wb") as f:
        f.write(blob)

    # Parity: replay through the TFLite interpreter (the runtime a
    # mobile consumer actually ships) vs the jax forward.
    x = np.asarray(jax.random.normal(
        jax.random.key(0), (min(sample_batch, 256), cfg32.input_dim),
        jnp.float32))
    interp = tf.lite.Interpreter(model_path=path)
    inp = interp.get_input_details()[0]
    interp.resize_tensor_input(inp["index"], list(x.shape))
    interp.allocate_tensors()
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    got = interp.get_tensor(interp.get_output_details()[0]["index"])
    want = np.asarray(jax.jit(
        lambda v: apply_r2l(params, cfg32, v))(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    log(f"[export] wrote {path} (TFLite interpreter parity check passed)")
    return path
