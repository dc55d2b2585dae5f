"""ONNX drop-in conversion drill (VERDICT r3 ask 8).

The reference scores DNSMOS/SigMOS through onnxruntime sessions over
released .onnx files (look2hear/metrics/dnsmos.py:24-25,
sigmos.py:39-42). Those weights are absent in this environment, so the
drop-in path must be *exercised*, not just shape-checked: build a
synthetic .onnx fixture in the published models' layout (NCHW
Conv/Gemm stacks), serialize it through the first-party wire-format
writer, read it back with the dependency-free loader, port the
initializers into the flax estimators, and diff the flax forward
against an onnxruntime-free numpy evaluation of the graph itself.
"""

import numpy as np
import pytest

from targetdiarization_tpu.runtime.onnx_io import (
    OnnxGraph,
    OnnxNode,
    evaluate_onnx,
    load_onnx,
    onnx_to_flax_params,
    save_onnx,
)


def _conv_node(name, cin_name, w, b, graph, pads, strides=(1, 1)):
    graph.initializers[f"{name}_w"] = w
    graph.initializers[f"{name}_b"] = b
    graph.nodes.append(OnnxNode(
        "Conv", [cin_name, f"{name}_w", f"{name}_b"], [name], name=name,
        attrs={"kernel_shape": list(w.shape[2:]), "pads": list(pads),
               "strides": list(strides)}))
    return name


def _gemm_node(name, in_name, w, b, graph):
    graph.initializers[f"{name}_w"] = w  # (out, in), transB=1
    graph.initializers[f"{name}_b"] = b
    graph.nodes.append(OnnxNode(
        "Gemm", [in_name, f"{name}_w", f"{name}_b"], [name], name=name,
        attrs={"transB": 1}))
    return name


def _relu(name, in_name, graph):
    graph.nodes.append(OnnxNode("Relu", [in_name], [name], name=name))
    return name


def _build_dnsmos_onnx(rng, ch=8, n_out=3):
    """Synthetic sig_bak_ovr.onnx-layout model matching DNSMOSNet(ch):
    4× [Conv 3×3 SAME + Relu + MaxPool 2×2] → GAP → fc1 → fc2 → head."""
    g = OnnxGraph([], {}, ["input_1"], ["output_1"])
    h = "input_1"
    cin = 1
    for i, c in enumerate((ch, ch, ch * 2, ch * 2)):
        w = (rng.standard_normal((c, cin, 3, 3)) * 0.2).astype(np.float32)
        b = (rng.standard_normal(c) * 0.05).astype(np.float32)
        h = _conv_node(f"conv{i}", h, w, b, g, pads=(1, 1, 1, 1))
        h = _relu(f"relu{i}", h, g)
        g.nodes.append(OnnxNode(
            "MaxPool", [h], [f"pool{i}"], name=f"pool{i}",
            attrs={"kernel_shape": [2, 2], "strides": [2, 2]}))
        h = f"pool{i}"
        cin = c
    g.nodes.append(OnnxNode("ReduceMean", [h], ["gap"], name="gap",
                            attrs={"axes": [2, 3], "keepdims": 0}))
    h = "gap"
    for name, n in (("fc1", 128), ("fc2", 64)):
        w = (rng.standard_normal((n, cin)) * 0.1).astype(np.float32)
        b = (rng.standard_normal(n) * 0.05).astype(np.float32)
        h = _gemm_node(name, h, w, b, g)
        h = _relu(f"{name}_relu", h, g)
        cin = n
    w = (rng.standard_normal((n_out, cin)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(n_out) * 0.05).astype(np.float32)
    h = _gemm_node("head", h, w, b, g)
    g.nodes[-1].outputs = ["output_1"]
    return g


def _build_sigmos_onnx(rng, ch=8, n_out=7):
    """Synthetic SigMOS-layout model matching SigMOSNet(ch): 3-channel
    compressed-STFT input, 3× [Conv 3×5 SAME + Relu + MaxPool 2×4] →
    concat(mean, max) → fc1 → head."""
    g = OnnxGraph([], {}, ["input_1"], ["output_1"])
    h = "input_1"
    cin = 3
    for i, c in enumerate((ch, ch * 2, ch * 2)):
        w = (rng.standard_normal((c, cin, 3, 5)) * 0.1).astype(np.float32)
        b = (rng.standard_normal(c) * 0.05).astype(np.float32)
        h = _conv_node(f"conv{i}", h, w, b, g, pads=(1, 2, 1, 2))
        h = _relu(f"relu{i}", h, g)
        g.nodes.append(OnnxNode(
            "MaxPool", [h], [f"pool{i}"], name=f"pool{i}",
            attrs={"kernel_shape": [2, 4], "strides": [2, 4]}))
        h = f"pool{i}"
        cin = c
    g.nodes.append(OnnxNode("ReduceMean", [h], ["mean"], name="mean",
                            attrs={"axes": [2, 3], "keepdims": 0}))
    g.nodes.append(OnnxNode("ReduceMax", [h], ["max"], name="max",
                            attrs={"axes": [2, 3], "keepdims": 0}))
    g.nodes.append(OnnxNode("Concat", ["mean", "max"], ["pooled"],
                            name="concat", attrs={"axis": 1}))
    w = (rng.standard_normal((128, cin * 2)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(128) * 0.05).astype(np.float32)
    h = _gemm_node("fc1", "pooled", w, b, g)
    h = _relu("fc1_relu", h, g)
    w = (rng.standard_normal((n_out, 128)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(n_out) * 0.05).astype(np.float32)
    _gemm_node("head", h, w, b, g)
    g.nodes[-1].outputs = ["output_1"]
    return g


class TestWireFormat:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        g = _build_dnsmos_onnx(rng)
        path = str(tmp_path / "model.onnx")
        save_onnx(g, path)
        g2 = load_onnx(path)
        assert [n.op_type for n in g2.nodes] == [n.op_type for n in g.nodes]
        assert g2.inputs == ["input_1"] and g2.outputs == ["output_1"]
        for name, arr in g.initializers.items():
            np.testing.assert_array_equal(g2.initializers[name], arr)
        attrs = {n.name: n.attrs for n in g2.nodes}
        assert attrs["conv0"]["pads"] == [1, 1, 1, 1]
        assert attrs["head"]["transB"] == 1

    def test_load_bytes(self):
        rng = np.random.default_rng(1)
        g = _build_sigmos_onnx(rng)
        buf = save_onnx(g)
        g2 = load_onnx(buf)
        assert len(g2.initializers) == len(g.initializers)


class TestDNSMOSDrill:
    """End-to-end: synthetic DNSMOS onnx → flax DNSMOSNet params →
    forward parity against the numpy graph evaluation."""

    def test_conversion_matches_graph(self, tmp_path):
        import jax

        from targetdiarization_tpu.train.mos import DNSMOSNet

        rng = np.random.default_rng(42)
        g = _build_dnsmos_onnx(rng, ch=8, n_out=3)
        path = str(tmp_path / "sig_bak_ovr.onnx")
        save_onnx(g, path)

        net = DNSMOSNet(n_out=3, ch=8)
        mel = (rng.standard_normal((2, 24, 120)) * 0.5).astype(np.float32)
        template = net.init(jax.random.PRNGKey(0), mel)
        params = onnx_to_flax_params(load_onnx(path), template)

        flax_out = np.asarray(net.apply(params, mel))
        onnx_out = evaluate_onnx(load_onnx(path),
                                 {"input_1": mel[:, None]})["output_1"]
        np.testing.assert_allclose(flax_out, onnx_out, rtol=2e-4, atol=2e-4)

    def test_estimator_accepts_converted_params(self, tmp_path):
        """MOSEstimator scores audio with ONNX-ported weights — the full
        drop-in path the released model would take."""
        import jax

        from targetdiarization_tpu.train.mos import DNSMOSNet, MOSEstimator

        rng = np.random.default_rng(3)
        g = _build_dnsmos_onnx(rng, ch=32, n_out=3)
        g808 = _build_dnsmos_onnx(np.random.default_rng(4), ch=32, n_out=1)
        net = DNSMOSNet(n_out=3)
        net808 = DNSMOSNet(n_out=1)
        mel0 = np.zeros((1, 900, 120), np.float32)
        p = onnx_to_flax_params(
            load_onnx(save_onnx(g)), net.init(jax.random.PRNGKey(0), mel0))
        p808 = onnx_to_flax_params(
            load_onnx(save_onnx(g808)),
            net808.init(jax.random.PRNGKey(1), mel0))
        est = MOSEstimator(params=p, params_p808=p808)
        audio = (rng.standard_normal(16000 * 10) * 0.1).astype(np.float32)
        out = est(audio)
        for k in ("OVRL", "SIG", "BAK", "P808_MOS"):
            assert np.isfinite(out[k])


class TestSigMOSDrill:
    def test_conversion_matches_graph(self, tmp_path):
        import jax

        from targetdiarization_tpu.train.mos import SigMOSNet

        rng = np.random.default_rng(7)
        g = _build_sigmos_onnx(rng, ch=8, n_out=7)
        buf = save_onnx(g, str(tmp_path / "sigmos.onnx"))

        net = SigMOSNet(n_out=7, ch=8)
        feat = (rng.standard_normal((1, 3, 20, 481)) * 0.5).astype(np.float32)
        template = net.init(jax.random.PRNGKey(0), feat)
        params = onnx_to_flax_params(load_onnx(buf), template)

        flax_out = np.asarray(net.apply(params, feat))
        onnx_out = evaluate_onnx(load_onnx(buf),
                                 {"input_1": feat})["output_1"]
        np.testing.assert_allclose(flax_out, onnx_out, rtol=2e-4, atol=2e-4)
